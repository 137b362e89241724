#!/usr/bin/env python3
"""External-engine readback of a graft table's Iceberg metadata export.

Mirrors the reference's DuckDB demo, which hand-walks the Iceberg
metadata tree rather than using an engine plugin
(/root/reference/query-engine/duckdbdemo/read_iceberg_duckdb.py:22-44,61):

  version-hint.text -> v<N>.metadata.json -> current snapshot ->
  manifest list (Avro) -> manifest(s) (Avro) -> data file paths ->
  DuckDB read_parquet([files])

The Avro object-container decoder below is written from the public Avro
1.11 spec (magic 'Obj\\x01', metadata map with embedded writer schema,
sync-delimited blocks of binary-encoded records; zigzag varints) and
shares no code with the Scala writer — this is an independent
implementation reading the exported metadata, which is the point of the
check. Codecs: null and deflate.

Usage: read_iceberg_duckdb.py <table_location> [SQL] [--at <ref-or-id>]
  Default SQL: SELECT COUNT(*) AS n FROM t
  The exported files are registered as DuckDB view `t`.
  --at: time travel over the exported history — a refs name
  (tag/"main") or a snapshot id; default = current-snapshot-id.
Prints the query result as CSV to stdout.
"""
import json
import os
import struct
import sys
import zlib


class Decoder:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, n):
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def read_long(self):
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self):
        return self.read(self.read_long())

    def read_value(self, schema):
        if isinstance(schema, list):  # union: long index picks the branch
            return self.read_value(schema[self.read_long()])
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                return {f["name"]: self.read_value(f["type"])
                        for f in schema["fields"]}
            if t == "array":
                out = []
                while True:
                    n = self.read_long()
                    if n == 0:
                        break
                    if n < 0:  # block with byte size prefix
                        self.read_long()
                        n = -n
                    out.extend(self.read_value(schema["items"])
                               for _ in range(n))
                return out
            if t == "map":
                out = {}
                while True:
                    n = self.read_long()
                    if n == 0:
                        break
                    if n < 0:
                        self.read_long()
                        n = -n
                    for _ in range(n):
                        k = self.read_bytes().decode()
                        out[k] = self.read_value(schema["values"])
                return out
            return self.read_value(t)  # {"type": "string"} wrapper
        if schema == "null":
            return None
        if schema == "boolean":
            return self.read(1) == b"\x01"
        if schema in ("int", "long"):
            return self.read_long()
        if schema == "float":
            return struct.unpack("<f", self.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", self.read(8))[0]
        if schema == "bytes":
            return self.read_bytes()
        if schema == "string":
            return self.read_bytes().decode()
        raise ValueError(f"unsupported avro type {schema}")


def read_avro(path):
    """Decode an Avro object-container file -> list of dict records."""
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:4] == b"Obj\x01", f"not an avro OCF: {path}"
    d = Decoder(data)
    d.pos = 4
    meta = {}
    while True:
        n = d.read_long()
        if n == 0:
            break
        if n < 0:
            d.read_long()
            n = -n
        for _ in range(n):
            k = d.read_bytes().decode()
            meta[k] = d.read_bytes()
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = d.read(16)
    records = []
    while d.pos < len(data):
        count = d.read_long()
        size = d.read_long()
        block = d.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        bd = Decoder(block)
        records.extend(bd.read_value(schema) for _ in range(count))
        assert d.read(16) == sync, "sync marker mismatch"
    return records


def decode_dv(path, offset, length):
    """Iceberg v3 deletion-vector-v1 blob -> sorted deleted positions.

    Decoded from the public specs only (Iceberg table-spec v3 blob
    framing; RoaringFormatSpec portable-64): 4-byte BE length of
    (magic + vector), magic D1 D3 39 64, a 64-bit portable roaring
    bitmap (8-byte LE bucket count, then per bucket a 4-byte LE high
    key and a standard 32-bit roaring serialization — cookie 12346/
    12347, array / bitmap / run containers), 4-byte CRC (tolerated).
    Independent of the Scala writer — that's the point of the check."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        blob = fh.read(length)
    (comb,) = struct.unpack(">i", blob[:4])
    assert blob[4:8] == b"\xd1\xd3\x39\x64", f"bad DV magic in {path}"
    vec = blob[8:4 + comb]
    out = []
    pos = 0
    (nparts,) = struct.unpack_from("<q", vec, pos)
    pos += 8
    for _ in range(nparts):
        (high,) = struct.unpack_from("<i", vec, pos)
        pos += 4
        base = (high & 0xFFFFFFFF) << 32
        start = pos
        (cookie,) = struct.unpack_from("<i", vec, pos)
        pos += 4
        if (cookie & 0xFFFF) == 12347:  # run containers present
            n = ((cookie >> 16) & 0xFFFF) + 1
            nb = (n + 7) // 8
            flags = vec[pos:pos + nb]
            pos += nb
        else:
            assert cookie == 12346, f"not a roaring bitmap ({cookie})"
            (n,) = struct.unpack_from("<i", vec, pos)
            pos += 4
            flags = None
        keys, cards = [], []
        for _i in range(n):
            k, c = struct.unpack_from("<HH", vec, pos)
            pos += 4
            keys.append(k)
            cards.append(c + 1)
        has_off = flags is None or n >= 4
        offs = []
        if has_off:
            for _i in range(n):
                (o,) = struct.unpack_from("<i", vec, pos)
                pos += 4
                offs.append(o)
        for i in range(n):
            if has_off:
                pos = start + offs[i]
            hi = base | (keys[i] << 16)
            is_run = flags is not None and (flags[i // 8] >> (i % 8)) & 1
            if is_run:
                (nruns,) = struct.unpack_from("<H", vec, pos)
                pos += 2
                for _r in range(nruns):
                    s, ln = struct.unpack_from("<HH", vec, pos)
                    pos += 4
                    out.extend(hi | v for v in range(s, s + ln + 1))
            elif cards[i] > 4096:  # bitmap container: 1024 LE words
                for w in range(1024):
                    (word,) = struct.unpack_from("<Q", vec, pos)
                    pos += 8
                    while word:
                        b = (word & -word).bit_length() - 1
                        out.append(hi | (w * 64 + b))
                        word &= word - 1
            else:  # array container
                for _v in range(cards[i]):
                    (v,) = struct.unpack_from("<H", vec, pos)
                    pos += 2
                    out.append(hi | v)
    return sorted(out)


DUCK_TYPES = {"boolean": "BOOLEAN", "int": "INTEGER", "long": "BIGINT",
              "float": "FLOAT", "double": "DOUBLE", "string": "VARCHAR",
              "date": "DATE", "timestamptz": "TIMESTAMPTZ",
              "timestamp": "TIMESTAMP"}


def decode_bound(raw, typ):
    """Iceberg Appendix-D single-value binary -> python value."""
    if raw is None:
        return None
    if typ in ("int", "date"):
        return struct.unpack("<i", raw)[0]
    if typ in ("long", "timestamptz", "timestamp"):
        return struct.unpack("<q", raw)[0]
    if typ == "float":
        return struct.unpack("<f", raw)[0]
    if typ == "double":
        return struct.unpack("<d", raw)[0]
    if typ == "boolean":
        return raw == b"\x01"
    if typ == "string":
        return raw.decode()
    if typ.startswith("decimal"):
        return int.from_bytes(raw, "big", signed=True)
    return None


def iceberg_scan_plan(location, at=None):
    """-> (schema [(name, iceberg_type)], identity part cols, spec fields,
           [(file, {part_col: value}, lower_bounds, upper_bounds, seq)],
           [(delete_file, seq, [equality col names] | None)])
       bounds are {col_name: decoded_value} from the manifest's
       map<field_id, binary> stats (ids 125/128). The last element lists
       v2 delete files (manifest-list content=1): EQUALITY deletes
       (data_file content=2, cols = their equality column names) apply to
       data files whose data sequence number is strictly lower;
       POSITION deletes (data_file content=1, cols=None, rows of
       (file_path, pos)) apply at data sequence <= the delete's."""
    meta_dir = os.path.join(location, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if location.endswith(".metadata.json"):
        # an exact metadata-file handle — the shape a CATALOG hands an
        # external engine (honored verbatim, no directory resolution)
        meta_file = location
    elif os.path.exists(hint):
        with open(hint) as fh:
            version = int(fh.read().strip())
        meta_file = os.path.join(meta_dir, f"v{version}.metadata.json")
    else:
        # no hint (e.g. a <NNNNN>-<uuid>.metadata.json family): highest
        # numeric version wins, name as tiebreak — the spec's fallback
        def version_of(name):
            stem = name[:-len(".metadata.json")]
            if stem.startswith("v") and stem[1:].isdigit():
                return int(stem[1:])
            digits = ""
            for ch in stem:
                if ch.isdigit():
                    digits += ch
                else:
                    break
            return int(digits) if digits else -1
        cands = [n for n in os.listdir(meta_dir)
                 if n.endswith(".metadata.json")]
        assert cands, f"no *.metadata.json under {meta_dir}"
        meta_file = os.path.join(
            meta_dir, max(cands, key=lambda n: (version_of(n), n)))
    with open(meta_file) as fh:
        meta = json.load(fh)
    current = meta["current-snapshot-id"]
    if at is not None:
        # time travel: a ref name (tag/branch) or a snapshot id
        refs = meta.get("refs", {})
        current = (refs[at]["snapshot-id"] if at in refs else int(at))
    [snap] = [s for s in meta["snapshots"]
              if s["snapshot-id"] == current]
    [schema] = [s for s in meta["schemas"]
                if s["schema-id"] == meta["current-schema-id"]]
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    by_id = {f["id"]: (f["name"], f["type"]) for f in schema["fields"]}
    [spec] = [s for s in meta["partition-specs"]
              if s["spec-id"] == meta["default-spec-id"]]
    part_cols = [f["name"] for f in spec["fields"]
                 if f["transform"] == "identity"]

    def bounds(df, key):
        out = {}
        for kv in (df.get(key) or []):
            name, typ = by_id.get(kv["key"], (None, None))
            if name is not None:
                out[name] = decode_bound(kv["value"], typ)
        return out

    list_path = snap["manifest-list"].replace("file:", "")
    files, deletes, dvs = [], [], []
    for mf in read_avro(list_path):
        manifest = mf["manifest_path"].replace("file:", "")
        for entry in read_avro(manifest):
            if entry["status"] == 2:  # 2 = DELETED
                continue
            df = entry["data_file"]
            seq = entry.get("sequence_number")
            seq = 1 if seq is None else seq
            if mf.get("content") == 1:  # delete manifest
                assert df["content"] in (1, 2), \
                    f"unknown delete content {df['content']}"
                fmt = (df.get("file_format") or "PARQUET").upper()
                if fmt == "PUFFIN":  # v3 deletion vector blob slice
                    dvs.append((df["file_path"].replace("file:", ""),
                                df["content_offset"],
                                df["content_size_in_bytes"],
                                df["referenced_data_file"], seq))
                    continue
                cols = ([by_id[i][0] for i in df["equality_ids"]]
                        if df["content"] == 2 else None)
                deletes.append((df["file_path"].replace("file:", ""),
                                seq, cols))
            else:
                files.append((df["file_path"].replace("file:", ""),
                              df.get("partition") or {},
                              bounds(df, "lower_bounds"),
                              bounds(df, "upper_bounds"),
                              seq))
    deletes.sort(key=lambda d: d[1])
    return fields, part_cols, spec["fields"], files, deletes, dvs


def main():
    args = list(sys.argv[1:])
    at = None
    if "--at" in args:
        i = args.index("--at")
        at = args[i + 1]
        del args[i:i + 2]
    location = args[0]
    sql = args[1] if len(args) > 1 else "SELECT COUNT(*) AS n FROM t"
    fields, part_cols, spec_fields, files, deletes, dvs = \
        iceberg_scan_plan(location, at)
    if sql == "--plan":
        # machine-readable scan plan: what an external planner would see
        # (partition tuples for dir pruning, column bounds for stats
        # pruning, equality-delete files with their scoping sequences) —
        # decoded entirely by THIS reader, no Iceberg library
        print(json.dumps({
            "spec": spec_fields,
            "files": [{"path": p, "partition": part,
                       "lower_bounds": lo, "upper_bounds": hi,
                       "sequence_number": seq}
                      for p, part, lo, hi, seq in files],
            "deletes": [{"path": p, "sequence_number": seq,
                         "content": "equality" if cols is not None
                         else "position",
                         "equality_cols": cols}
                        for p, seq, cols in deletes],
            "deletion_vectors": [
                {"path": p, "offset": off, "length": ln,
                 "referenced_data_file": ref, "sequence_number": seq}
                for p, off, ln, ref, seq in dvs]}, indent=1))
        return
    if not files:
        print("")
        return
    types = dict(fields)
    col_list = ", ".join(f'"{n}"' for n, _ in fields)

    def sql_lit(v, typ):
        if v is None:
            return f"CAST(NULL AS {DUCK_TYPES[typ]})"
        s = str(v).replace("'", "''")
        return f"CAST('{s}' AS {DUCK_TYPES[typ]})"

    # identity-partition columns live in the manifest partition tuples,
    # not the data files: one branch per (tuple, data sequence)
    # reconstructs them; __gseq carries the file's data sequence so the
    # equality-delete predicate below can scope strictly-older rows
    pos_deletes = [(p, seq) for p, seq, cols in deletes if cols is None]
    eq_deletes = [(p, seq, cols) for p, seq, cols in deletes
                  if cols is not None]
    # position deletes (parquet rows OR v3 deletion vectors) match on
    # (data file path, row ordinal): the scan must then carry both as
    # virtual columns
    need_pos = bool(pos_deletes or dvs)
    meta_cols = (", filename=true, file_row_number=true"
                 if need_pos else "")
    meta_sel = (', filename AS "__gfile", file_row_number AS "__gpos"'
                if need_pos else "")
    meta_names = ', "__gfile", "__gpos"' if need_pos else ""
    groups = {}
    for path, part, _lo, _hi, seq in files:
        key = (tuple(part.get(c) for c in part_cols), seq)
        groups.setdefault(key, []).append(path)
    branches = []
    for (key, seq), paths in groups.items():
        flist = ", ".join("'" + f.replace("'", "''") + "'" for f in paths)
        consts = "".join(
            f", {sql_lit(v, types[c])} AS \"{c}\""
            for c, v in zip(part_cols, key))
        branches.append(
            f"SELECT * {consts}, {seq} AS __gseq{meta_sel} "
            f"FROM read_parquet([{flist}]{meta_cols})")
    union = " UNION ALL ".join(
        f"SELECT {col_list}, __gseq{meta_names} FROM ({b})"
        for b in branches)
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t_base AS {union}")
    # one delete relation per equality-column set (files keep their own
    # sequences); a base row survives when no applicable delete matches:
    # NOT EXISTS with del.__dseq > row.__gseq — the v2 strict ordering
    eq_groups = {}
    for path, seq, cols in eq_deletes:
        eq_groups.setdefault(tuple(cols), []).append((path, seq))
    conds = []
    if need_pos:
        # v2 position semantics: applies at data sequence <= delete's;
        # file_path values are full URIs — normalized like every other
        # manifest path in this reader. v3 deletion vectors decode to
        # the same (file, pos, seq) shape and union in.
        parts = [
            "SELECT replace(file_path, 'file:', '') AS file_path, pos, "
            f"{seq} AS __dseq FROM read_parquet(['" +
            p.replace("'", "''") + "'])"
            for p, seq in pos_deletes]
        if dvs:
            con.execute("CREATE TABLE dv_d (file_path VARCHAR, "
                        "pos BIGINT, __dseq BIGINT)")
            dv_rows = [(ref.replace("file:", ""), int(p), seq)
                       for path, off, ln, ref, seq in dvs
                       for p in decode_dv(path, off, ln)]
            con.executemany("INSERT INTO dv_d VALUES (?, ?, ?)", dv_rows)
            parts.append("SELECT file_path, pos, __dseq FROM dv_d")
        con.execute("CREATE VIEW pos_d AS " + " UNION ALL ".join(parts))
        conds.append("NOT EXISTS (SELECT 1 FROM pos_d "
                     "WHERE pos_d.file_path = b.\"__gfile\" "
                     "AND pos_d.pos = b.\"__gpos\" "
                     "AND pos_d.__dseq >= b.__gseq)")
    for gi, (cols, dfiles) in enumerate(eq_groups.items()):
        dsel = " UNION ALL ".join(
            "SELECT " + ", ".join(f'"{c}"' for c in cols) +
            f", {seq} AS __dseq FROM read_parquet(['" +
            p.replace("'", "''") + "'])"
            for p, seq in dfiles)
        con.execute(f"CREATE VIEW d_{gi} AS {dsel}")
        match = " AND ".join(f'd_{gi}."{c}" = b."{c}"' for c in cols)
        conds.append(f"NOT EXISTS (SELECT 1 FROM d_{gi} "
                     f"WHERE {match} AND d_{gi}.__dseq > b.__gseq)")
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    con.execute(f"CREATE VIEW t AS SELECT {col_list} FROM t_base b{where}")
    rows = con.execute(sql).fetchall()
    cols = [d[0] for d in con.description]
    print(",".join(cols))
    for r in rows:
        print(",".join("" if v is None else str(v) for v in r))


if __name__ == "__main__":
    main()
