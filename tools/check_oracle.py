#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Reads the ENGINE parquet via pyarrow (native types — Decimal stays
Decimal, exactly like the driver's hasher) and the ORACLE via DuckDB
fetchall, then mirrors the driver's pandas coercion on the oracle side
(DECIMAL -> float64). This asymmetry is deliberate: it reproduces the
one documented driver divergence class (round 6's q205 escape, where a
DECIMAL(38,0) engine column compared equal locally because BOTH sides
went through DuckDB fetchdf, while the driver read the engine parquet
natively and saw Decimal('200797796') vs 200797796.0).

Usage: check_oracle.py <sfDir> <verifyOutDir>
Self-test: check_oracle.py --selftest
"""
import sys, json, glob, os, math, datetime, decimal
import duckdb
import pyarrow.parquet as pq


def canon(v, engine_side):
    """Canonical string for one value. Engine side keeps native exact
    renderings; oracle side mirrors the driver's pandas coercion of
    DECIMAL to float64. Int and integral-decimal-on-engine-side stay
    distinct from float ('5' vs '5.0') — that distinction IS the q205
    escape class."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        if engine_side:
            return format(v, "f")  # exact, no exponent: '200797796'
        return canon(float(v), engine_side)  # driver's pandas coercion
    if isinstance(v, float):
        if math.isnan(v):
            # distinct from the NULL sentinel: an engine NaN vs an oracle
            # NULL is a real divergence the driver's native hasher sees
            return "NaN"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x, engine_side) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{canon(x, engine_side)}" for k, x in sorted(v.items())) + "}"
    if hasattr(v, "item"):  # numpy scalar leaked through
        return canon(v.item(), engine_side)
    return str(v)


def canon_rows(cols, rows, engine_side):
    """Sorted canonical row tuples, columns pre-sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i], engine_side) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def read_engine(qdir):
    tbl = pq.read_table(qdir)
    cols = list(tbl.column_names)
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return canon_rows(cols, rows, engine_side=True)


def read_oracle(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return canon_rows(cols, rows, engine_side=False)


def compare_dir(con, qname, qdir, oracle_sql):
    """Returns (status_line, failed: bool)."""
    gcols, grows = read_engine(qdir)
    if oracle_sql is None:
        if len(grows) == 0:
            return f"{qname:28s} EMPTY (rows-only FAIL)", True
        return f"{qname:28s} rows-only ({len(grows)} rows)", False
    ecols, erows = read_oracle(con, oracle_sql)
    ok_schema = gcols == ecols
    ok_rows = len(grows) == len(erows)
    ok_vals = ok_schema and ok_rows and grows == erows
    if ok_schema and ok_rows and ok_vals:
        return f"{qname:28s} OK ({len(grows)} rows)", False
    lines = [f"{qname:28s} MISMATCH schema={ok_schema} "
             f"rows={len(grows)}vs{len(erows)} vals={ok_vals}"]
    if not ok_schema:
        lines.append(f"  got cols: {gcols}\n  exp cols: {ecols}")
    elif ok_rows:
        shown = 0
        for g, e in zip(grows, erows):
            if g != e and shown < 3:
                diffc = [gcols[i] for i in range(len(gcols)) if g[i] != e[i]]
                lines.append(f"  differing cols {diffc}:\n    got: {g}\n    exp: {e}")
                shown += 1
    return "\n".join(lines), True


def main(sf, out):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    fails = 0
    # evidence completeness: every query the manifest declares must have
    # an output dir — a query that threw during Verify is a FAILURE
    mpath = os.path.join(out, "manifest.json")
    if os.path.exists(mpath):
        declared = set(json.load(open(mpath)))
        present = {d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d))}
        for missing in sorted(declared - present):
            fails += 1
            print(f"{missing:28s} MISSING (declared in manifest, no output)")
        if not declared:
            # an EMPTY manifest means Verify ran zero queries — a typo'd
            # selector used to pass vacuously through here (r10 verdict)
            print("EMPTY MANIFEST (Verify ran zero queries) — FAIL")
            return 1
    checked = 0
    for qname in sorted(os.listdir(out)):
        qdir = os.path.join(out, qname)
        if not os.path.isdir(qdir):
            continue
        checked += 1
        line, failed = compare_dir(con, qname, qdir, oracle.get(qname))
        print(line)
        fails += failed
    if checked == 0:
        print("NO QUERY OUTPUTS FOUND — FAIL")
        return 1
    return 1 if fails else 0


def selftest():
    """Regression fixture for the round-6 q205 escape: a DECIMAL(38,0)
    engine column vs a DECIMAL(38,0) oracle column must MISMATCH (the
    driver coerces only the oracle side to float64), and the fixed
    contract (DOUBLE on both sides) must match."""
    import tempfile, pyarrow as pa
    tmp = tempfile.mkdtemp(prefix="chkoracle_")
    con = duckdb.connect()

    def write(qname, table):
        d = os.path.join(tmp, qname)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "part-0.parquet"))
        return d

    dec = pa.table({"g": ["A"], "r2_a": pa.array(
        [decimal.Decimal("200797796")], pa.decimal128(38, 0))})
    d1 = write("decimal_escape", dec)
    line, failed = compare_dir(
        con, "decimal_escape", d1,
        "SELECT 'A' AS g, CAST(200797796 AS DECIMAL(38,0)) AS r2_a")
    assert failed, f"DECIMAL(38,0) escape NOT flagged: {line}"

    dbl = pa.table({"g": ["A"], "r2_a": pa.array([200797796.0], pa.float64())})
    d2 = write("double_fixed", dbl)
    line, failed = compare_dir(
        con, "double_fixed", d2,
        "SELECT 'A' AS g, CAST(CAST(200797796 AS VARCHAR) AS DOUBLE) AS r2_a")
    assert not failed, f"canonical DOUBLE contract flagged: {line}"

    # int column must stay distinct from double ('5' vs '5.0')
    iv = pa.table({"n": pa.array([5], pa.int64())})
    d3 = write("int_vs_double", iv)
    line, failed = compare_dir(con, "int_vs_double", d3,
                               "SELECT CAST(5 AS DOUBLE) AS n")
    assert failed, f"int-vs-double not flagged: {line}"

    # and a plain green path: bigint/string/double all equal
    ok = pa.table({"s": ["x"], "n": pa.array([7], pa.int64()),
                   "d": pa.array([1.5], pa.float64())})
    d4 = write("plain_ok", ok)
    line, failed = compare_dir(
        con, "plain_ok", d4,
        "SELECT 'x' AS s, CAST(7 AS BIGINT) AS n, CAST(1.5 AS DOUBLE) AS d")
    assert not failed, f"plain green path failed: {line}"

    # NULL vs value must mismatch; NULL vs NULL must match
    nv = pa.table({"n": pa.array([None], pa.int64())})
    d5 = write("null_ok", nv)
    line, failed = compare_dir(con, "null_ok", d5,
                               "SELECT CAST(NULL AS BIGINT) AS n")
    assert not failed, f"NULL==NULL failed: {line}"

    # NaN is NOT the NULL sentinel: engine NaN vs oracle NULL must
    # mismatch, and NaN vs NaN must match
    nan = pa.table({"d": pa.array([float("nan")], pa.float64())})
    d6 = write("nan_vs_null", nan)
    line, failed = compare_dir(con, "nan_vs_null", d6,
                               "SELECT CAST(NULL AS DOUBLE) AS d")
    assert failed, f"NaN-vs-NULL not flagged: {line}"
    d7 = write("nan_vs_nan", nan)
    line, failed = compare_dir(con, "nan_vs_nan", d7,
                               "SELECT CAST('NaN' AS DOUBLE) AS d")
    assert not failed, f"NaN==NaN failed: {line}"

    # an empty manifest (Verify matched zero queries) must FAIL the gate,
    # not pass vacuously (r10 verdict: a typo'd selector slipped through)
    empty = os.path.join(tmp, "empty_run")
    os.makedirs(empty, exist_ok=True)
    with open(os.path.join(empty, "oracle_sql.json"), "w") as f:
        f.write("{}")
    with open(os.path.join(empty, "manifest.json"), "w") as f:
        f.write("[]")
    assert main(tmp, empty) == 1, "empty manifest passed vacuously"
    # and a manifest-less dir with zero query outputs must fail too
    os.remove(os.path.join(empty, "manifest.json"))
    assert main(tmp, empty) == 1, "zero query outputs passed vacuously"
    print("selftest OK (9 fixtures)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
