"""Local replica of the driver's oracle-differential gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the same query on DuckDB over the same
parquet tables; compares row count, sorted column names, and an
order-insensitive multiset of stringified values.

Usage: python tools/check_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from angelone_clickhouse_spark import TABLES
from angelone_clickhouse_spark.session import get_spark


def _norm(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(",".join(_norm(r[i]) for i in order) for r in rows)


def _split_top(s: str) -> list[str]:
    """Split ``s`` on commas at nesting depth 0 (shared by the DuckDB
    and Spark nested-type parsers)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _canon_duck_type(t: str) -> str:
    """Canonical type tag for a DuckDB result column type string.

    Timestamps keep their tz-ness distinct (ADVICE r13): DuckDB
    ``TIMESTAMP``/``TIMESTAMP_NTZ`` (naive) canonicalize to ``ts``
    (matching Spark's collect()-naive datetimes), while
    ``TIMESTAMPTZ`` / ``TIMESTAMP WITH TIME ZONE`` become ``ts_tz`` —
    a tz-aware oracle column now FAILS the local gate the same way the
    driver's value hash would (isoformat carries the +00:00 suffix).
    Struct/map are normalized into the same ``struct<name:tag,...>`` /
    ``map<tag,tag>`` grammar as the Spark side, so nested results can
    actually match instead of guaranteeing a false mismatch.
    """
    t = str(t).strip().upper()
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")  # keep precision/scale — drivers hash them
    if t in ("TIMESTAMPTZ", "TIMESTAMP WITH TIME ZONE"):
        return "ts_tz"
    if t.startswith("TIMESTAMP"):  # TIMESTAMP, TIMESTAMP_NTZ, TIMESTAMP_S/MS/NS
        return "ts"
    m = re.fullmatch(r"STRUCT\((.*)\)", t, re.S)
    if m:
        fields = []
        for part in _split_top(m.group(1)):
            name, _, ftype = part.partition(" ")
            fields.append(f"{name.strip().strip(chr(34)).lower()}:"
                          + _canon_duck_type(ftype))
        return "struct<" + ",".join(fields) + ">"
    m = re.fullmatch(r"MAP\((.*)\)", t, re.S)
    if m:
        kv = _split_top(m.group(1))
        return "map<" + ",".join(_canon_duck_type(p) for p in kv) + ">"
    if t.endswith("[]"):
        return "list<" + _canon_duck_type(t[:-2]) + ">"
    m = re.fullmatch(r"LIST\((.*)\)", t, re.S)
    if m:
        return "list<" + _canon_duck_type(m.group(1)) + ">"
    return {
        "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32",
        "BIGINT": "i64", "HUGEINT": "i128",
        "UTINYINT": "u8", "USMALLINT": "u16", "UINTEGER": "u32",
        "UBIGINT": "u64",
        "FLOAT": "f32", "REAL": "f32", "DOUBLE": "f64",
        "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
        "BLOB": "bytes",
    }.get(t, t)


def _canon_spark_type(t: str) -> str:
    """Canonical type tag for a Spark ``dataType.simpleString()``.

    Both Spark timestamp flavors map to ``ts``: LTZ and NTZ alike
    surface as tz-NAIVE ``datetime`` objects from ``collect()`` (LTZ is
    rendered in the session tz, fixed to UTC here), so their value
    strings match a naive DuckDB TIMESTAMP and can never match a
    tz-aware ``ts_tz`` column — see :func:`_canon_duck_type`.
    """
    t = t.strip().lower()
    if t.startswith("decimal"):
        return t.upper().replace(" ", "")
    if t.startswith("timestamp"):  # timestamp (LTZ) and timestamp_ntz
        return "ts"
    m = re.fullmatch(r"array<(.*)>", t, re.S)
    if m:
        return "list<" + _canon_spark_type(m.group(1)) + ">"
    m = re.fullmatch(r"struct<(.*)>", t, re.S)
    if m:
        fields = []
        for part in _split_top(m.group(1)):
            name, _, ftype = part.partition(":")
            fields.append(f"{name.strip().lower()}:" + _canon_spark_type(ftype))
        return "struct<" + ",".join(fields) + ">"
    m = re.fullmatch(r"map<(.*)>", t, re.S)
    if m:
        kv = _split_top(m.group(1))
        return "map<" + ",".join(_canon_spark_type(p) for p in kv) + ">"
    return {
        "tinyint": "i8", "smallint": "i16", "int": "i32",
        "bigint": "i64", "float": "f32", "double": "f64",
        "string": "str", "boolean": "bool", "date": "date",
        "binary": "bytes",
    }.get(t, t)


def _type_mismatches(sdf_schema, dcols, dtypes) -> list[str]:
    """Per-column canonical-type compare, joined on column name.

    The driver's value hash is TYPE-sensitive: DuckDB returning a
    HUGEINT (e.g. any correlated/plain ``sum()`` over BIGINT) or a
    DECIMAL where Spark returns BIGINT hash-mismatches even when every
    value is numerically equal — exactly what shipped zorder_layout red
    in r12 while this checker's stringified compare stayed green
    (ADVICE r12). Comparing canonical type tags here makes the local
    pre-flight predict the driver verdict.
    """
    stypes = {f.name: _canon_spark_type(f.dataType.simpleString())
              for f in sdf_schema.fields}
    dtyped = {c: _canon_duck_type(t) for c, t in zip(dcols, dtypes)}
    out = []
    for c in sorted(set(stypes) & set(dtyped)):
        if stypes[c] != dtyped[c]:
            out.append(f"{c}: spark={stypes[c]} duckdb={dtyped[c]}")
    return out


def run_parity(
    spark, sf_dir: str, only: set[str] | None = None, quiet: bool = False
) -> list[str]:
    """The oracle-differential over every registered query; returns the
    failing query names. Shared by the CLI below and
    tests/test_full_parity.py (the guard that keeps queries rotated
    out of the driver's 50-entry window honest)."""
    only = only or set()

    def _p(msg: str) -> None:
        if not quiet:
            print(msg)

    con = duckdb.connect()
    # the compare is order-insensitive (sorted multiset), so let
    # DuckDB drop insertion-order bookkeeping — materially lowers
    # memory/spill on the brute-force pairwise oracles at sf1.0
    con.sql("SET preserve_insertion_order=false")
    # env-provided values are validated before interpolation (ADVICE
    # r11: a malformed value failed confusingly and an attacker-
    # controlled env could inject SQL; DuckDB SET does not accept
    # prepared-statement parameters, so a strict allowlist it is)
    mem = os.environ.get("PARITY_DUCKDB_MEMORY")
    if mem:
        if not re.fullmatch(r"\d+(\.\d+)?\s*(GiB|GB|MiB|MB|KiB|KB|B)?", mem):
            raise SystemExit(
                f"PARITY_DUCKDB_MEMORY={mem!r}: expected e.g. '80GB'"
            )
        con.sql(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("PARITY_DUCKDB_TEMP")
    if tmp:
        if not re.fullmatch(r"[A-Za-z0-9_\-./]+", tmp):
            raise SystemExit(
                f"PARITY_DUCKDB_TEMP={tmp!r}: expected a plain path"
            )
        con.sql(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        # driver fixtures are single files; tools/make_sf1.py writes
        # Spark part-file directories — glob those for DuckDB
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sschema = sdf.schema
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            _p(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            _p(f"ok~   {name}: rows-only ({len(srows)} rows, "
               f"{time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dtypes = rel.types
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            _p(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        tmis = _type_mismatches(sschema, dcols, dtypes)
        if tmis:
            problems.append("column types differ: " + "; ".join(tmis))
        if not problems:
            sm, dm = _multiset(srows, scols), _multiset(drows, dcols)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            _p(f"FAIL  {name}: " + "; ".join(problems))
        else:
            _p(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    _p(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    failures = run_parity(spark, sf_dir, only)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
