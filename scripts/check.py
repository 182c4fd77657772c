#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py [verify_out_dir] [sf_dir]

Reads each <out>/<query>/ parquet dump written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same parquet tables,
and compares: columns sorted by name, rows sorted by all columns, values
compared exactly (plus a loose float fallback report so near-misses are
distinguishable from hard mismatches).

Also records per-query CANONICAL RESULT HASHES for both sides (engine
dump and DuckDB oracle result, both read through Arrow so types are
faithful) plus the DuckDB version into <out>/HASHES.json, and
cross-checks the Python engine-side hash against the Scala one in
<out>/engine_hashes.json (written by graft.Verify). The canonical form
is specified in Verify.renderCell's Scaladoc; the two implementations
must stay byte-identical. This exists because round 9's only red row
was a driver-vs-local divergence that could not be root-caused from
artifacts — neither side had recorded what hash it computed.

The verdict is HASH-STRICT (r10 lesson: stat_permutation_fdr shipped red
twice because the old verdict only float-compared values, so a
DECIMAL-vs-DOUBLE output-type divergence rendered "0.010000" vs the
double hex and failed the driver while passing here): PASS now requires
engine_hash == oracle_hash IN ADDITION to the cell compare, and an
output-dtype gate compares the two arrow schemas per column so a type
divergence names the offending column directly. Type classes that
render identically in the canonical form are allowlisted (any integer
width vs any integer width; decimals of equal scale; string vs
large_string); DECIMAL-vs-DOUBLE and any other render-visible class
mismatch fails — even on 0-row results, where the hash alone is blind
to types.
"""
import datetime
import glob
import hashlib
import json
import math
import struct
import sys
from decimal import Decimal

import duckdb
import pandas as pd
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

_EPOCH = datetime.datetime(1970, 1, 1)
_EPOCH_DAY = datetime.date(1970, 1, 1).toordinal()


def render(v) -> str:
    """Mirror of graft.Verify.renderCell — keep byte-identical."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "7ff8000000000000"  # canonical NaN, like doubleToLongBits
        return struct.pack(">d", v).hex()
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        td = v - _EPOCH
        return str(td.days * 86_400_000_000
                   + td.seconds * 1_000_000 + td.microseconds)
    if isinstance(v, datetime.date):
        return str(v.toordinal() - _EPOCH_DAY)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(render(e) for e in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(
            sorted(f"{render(k)}={render(x)}" for k, x in v.items())) + "}"
    return str(v)


def canonical_hash(tbl) -> str:
    """tbl: pyarrow.Table. Mirror of graft.Verify.canonicalHash."""
    cols = sorted(tbl.column_names)
    pylists = [tbl.column(c).to_pylist() for c in cols]
    rendered = sorted(
        "\u0001".join(render(col[i]) for col in pylists)
        for i in range(tbl.num_rows))
    content = "\n".join(["\u0001".join(cols)] + rendered)
    return hashlib.md5(content.encode("utf-8")).hexdigest()


def read_dump_arrow(name: str):
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        # Bit-exact, matching the driver's hash gate: -0.0 != +0.0 here
        # even though Python's `==` says they're equal (r8 feature_woe_encode
        # shipped red because the old `fa == fb` was blind to signed zeros).
        return struct.pack(">d", fa) == struct.pack(">d", fb)
    return str(a) == str(b)


def _type_class(t) -> str:
    """Collapse an arrow type to its canonical-render equivalence class.

    Two types in the same class render byte-identically through
    render(), so a class mismatch is exactly the set of divergences the
    driver's hash gate can see (or, for 0-row results, the ones it
    cannot see but that still mark a dialect-typing bug).
    """
    import pyarrow.types as pt
    if pt.is_null(t):
        return "null"  # all-NULL column; renders \\N regardless of type
    if pt.is_boolean(t):
        return "bool"
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float64" if t.bit_width == 64 else f"float{t.bit_width}"
    if pt.is_decimal(t):
        return f"decimal(scale={t.scale})"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return f"list<{_type_class(t.value_type)}>"
    if pt.is_struct(t):
        return "struct"
    return str(t)


def _class_compat(a: str, b: str) -> bool:
    """True when the two type classes render byte-identically.

    "null" (an all-NULL column/element type) is compatible with anything
    at ANY nesting depth: list<null> vs list<int> both render every
    element as \\N, exactly like the top-level null exemption.
    """
    if a == b or "null" in (a, b):
        return True
    if a.startswith("list<") and b.startswith("list<"):
        return _class_compat(a[5:-1], b[5:-1])
    return False


def schema_diff(got_tbl, want_tbl):
    """Per-column type-class diff (engine vs oracle), [] when clean."""
    gt = {f.name: f.type for f in got_tbl.schema}
    wt = {f.name: f.type for f in want_tbl.schema}
    diffs = []
    for c in sorted(set(gt) | set(wt)):
        if c not in gt or c not in wt:
            diffs.append(f"{c}: engine={gt.get(c)} oracle={wt.get(c)} (absent)")
            continue
        gc, wc = _type_class(gt[c]), _type_class(wt[c])
        if not _class_compat(gc, wc):
            diffs.append(f"{c}: engine={gt[c]}[{gc}] oracle={wt[c]}[{wc}]")
    return diffs


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame):
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        return f"COLUMNS got={list(got.columns)} want={list(want.columns)}"
    if len(got) != len(want):
        return f"ROWS got={len(got)} want={len(want)}"
    n_bad = 0
    example = None
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if not cell_eq(a, b):
                n_bad += 1
                if example is None:
                    example = f"col={c} row={i} got={a!r} want={b!r}"
    if n_bad:
        return f"VALUES {n_bad} mismatched cells; first: {example}"
    return None


def fresh_con():
    con = duckdb.connect()
    # 16 threads, not the machine's 32: each DuckDB worker thread brings
    # its own allocator arenas, and this process's binding constraint is
    # vm.max_map_count (see the recycle comment in main), not CPU
    con.execute("SET threads TO 16")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def n_maps() -> int:
    try:
        with open("/proc/self/maps") as fh:
            return sum(1 for _ in fh)
    except OSError:
        return -1


def main():
    import os
    # GRAFT_CHECK_NO_RECYCLE=1 reproduces the driver harness's posture:
    # one long-lived connection for the whole run, no gc/arrow release.
    # Use it to prove the allocation-heavy oracles survive a map-starved
    # process (vm.max_map_count exhaustion — see the recycle comment).
    no_recycle = os.environ.get("GRAFT_CHECK_NO_RECYCLE", "") == "1"
    con = fresh_con()
    with open(f"{OUT}/oracle_sql.json") as fh:
        oracle = json.load(fh)
    try:
        with open(f"{OUT}/engine_hashes.json") as fh:
            scala_hashes = json.load(fh).get("queries", {})
    except FileNotFoundError:
        scala_hashes = {}

    dumped = {p.rstrip("/").split("/")[-1]
              for p in glob.glob(f"{OUT}/*/")}
    hashes = {}
    mem_cost = {}  # name -> (maps_delta, duckdb_peak_bytes) telltale
    n_pass = n_fail = n_spec_drift = 0
    n_run = 0
    for name in sorted(oracle):
        if name not in dumped:
            print(f"MISSING-DUMP {name}")
            n_fail += 1
            continue
        # Recycle the DuckDB connection every 25 oracles: hundreds of
        # MATERIALIZED-heavy replays on one connection fragment memory
        # MAPPINGS (not memory — RSS stays ~1 GB) until the process hits
        # vm.max_map_count (65530), at which point mmap failures surface
        # as spurious "Out of Memory" oracle errors and finally a
        # segfault. Measured: maps plateau ~47k mid-run and spiked to
        # 65k+ at ~400 oracles. A fresh connection releases its maps;
        # gc + arrow-pool release drop the pyarrow side's share.
        n_run += 1
        if n_run % 25 == 0 and not no_recycle:
            con.close()
            import gc
            gc.collect()
            try:
                import pyarrow as pa
                pa.default_memory_pool().release_unused()
            except Exception:  # noqa: BLE001
                pass
            con = fresh_con()
            print(f"[maps] {n_maps()} after {n_run} oracles", flush=True)
        got_tbl = read_dump_arrow(name)
        if got_tbl is None:
            # No part files. Distinguish a 0-partition write (Spark emits
            # only _SUCCESS for an empty-RDD frame: a legitimate 0-row
            # result with unknown schema — checkable rows-only against
            # the oracle) from a truly failed/unreadable dump, which must
            # never "pass" against a 0-row oracle unchecked.
            if os.path.exists(f"{OUT}/{name}/_SUCCESS"):
                try:
                    want_n = len(con.execute(oracle[name]).arrow())
                except Exception as e:  # noqa: BLE001
                    print(f"ORACLE-ERROR {name}: {e}")
                    n_fail += 1
                    continue
                if want_n == 0:
                    print(f"PASS {name}: EMPTY-ENGINE-DUMP (0-partition write; "
                          f"rows-only check vs 0-row oracle, schema unchecked)")
                    n_pass += 1
                else:
                    print(f"FAIL {name}: EMPTY-ENGINE-DUMP but oracle has "
                          f"{want_n} rows")
                    n_fail += 1
            else:
                print(f"FAIL {name}: MISSING-ENGINE-PARQUET (dump dir empty/unreadable)")
                n_fail += 1
            continue
        got = got_tbl.to_pandas()
        maps_before = n_maps()
        try:
            res = con.execute(oracle[name])
            want_tbl = res.arrow()
            want = want_tbl.to_pandas()
        except Exception as e:  # noqa: BLE001
            print(f"ORACLE-ERROR {name}: {e}")
            n_fail += 1
            continue
        finally:
            # Allocation telltale: mappings this oracle left behind (the
            # resource the driver's single-connection run exhausts) plus
            # DuckDB's residual tracked bytes. Ranked at the end so
            # "allocation-heavy oracle" is a measured, regression-checked
            # property rather than a post-mortem discovery.
            try:
                resid = con.execute(
                    "SELECT coalesce(sum(memory_usage_bytes),0) "
                    "FROM duckdb_memory()").fetchone()[0]
            except Exception:  # noqa: BLE001
                resid = -1
            mem_cost[name] = (n_maps() - maps_before, int(resid))
        eh = canonical_hash(got_tbl) if got_tbl is not None else None
        oh = canonical_hash(want_tbl)
        hashes[name] = {"engine": eh, "oracle": oh}
        sh = scala_hashes.get(name, {}).get("hash")
        if sh is not None and eh is not None and sh != eh:
            # engines may still agree; this means the Scala/Python
            # canonicalizers drifted — fix the renderer, not the query
            print(f"HASH-SPEC-MISMATCH {name}: scala={sh} python={eh}")
            n_spec_drift += 1
        err = compare(name, got, want)
        if err is None and got_tbl is not None:
            # Hash-strict verdict: the driver compares canonical hashes,
            # so a value-equal-but-type-divergent output (DECIMAL vs
            # DOUBLE renders "0.010000" vs double hex) must fail HERE too.
            tdiff = schema_diff(got_tbl, want_tbl)
            if eh != oh:
                err = ("HASH engine != oracle; schema diff: "
                       + ("; ".join(tdiff) if tdiff
                          else "none — value-render or row-set divergence"))
            elif tdiff:
                # hash can be blind to types on 0-row / all-NULL outputs
                err = "TYPE-MISMATCH (hash-blind): " + "; ".join(tdiff)
        if err:
            print(f"FAIL {name}: {err} [engine={eh} oracle={oh}]")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    rows_only = dumped - set(oracle)
    for name in sorted(rows_only):
        tbl = read_dump_arrow(name)
        n = tbl.num_rows if tbl is not None else 0
        if tbl is not None:
            hashes[name] = {"engine": canonical_hash(tbl), "oracle": None}
        print(f"ROWS-ONLY {name}: {n} rows")
    if mem_cost:
        # Ranked allocation telltale: top decile by maps-delta. An oracle
        # near the top here is the one that dies first in a map-starved
        # (single-connection, no-recycle) run — keep the heavy list short.
        ranked = sorted(mem_cost.items(), key=lambda kv: -kv[1][0])
        top = ranked[:max(10, len(ranked) // 10)]
        print("\n[alloc] top decile by maps-delta (maps, duckdb residual bytes):")
        for nm, (md, rb) in top:
            print(f"[alloc]   {md:6d}  {rb:12d}  {nm}")
    with open(f"{OUT}/HASHES.json", "w") as fh:
        json.dump({"duckdb_version": duckdb.__version__,
                   "spec_drift": n_spec_drift,
                   "oracle_maps_delta": {k: v[0] for k, v in mem_cost.items()},
                   "queries": hashes}, fh, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only, "
          f"{n_spec_drift} hash-spec drift; hashes → {OUT}/HASHES.json "
          f"(duckdb {duckdb.__version__})")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
