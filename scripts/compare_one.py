#!/usr/bin/env python3
"""Compare ONE query's dump against its DuckDB oracle (bit-exact on
doubles, same strictness as compare_oracle.py) — used by per-query
timeout sweeps at stress scales where a few deliberately brute-force
oracles are intractable. Usage: compare_one.py <sfDir> <outDir> <name>"""
import hashlib, json, math, os, struct, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def pack(v):
    if isinstance(v, float):
        if math.isnan(v):
            return b"nan"
        return struct.pack("<d", v)
    return v

def main(sf_dir, out_dir, name):
    con = duckdb.connect()
    # bounded per-process resources: the sweep runs P of these at once,
    # and DuckDB's defaults (all cores, 80% RAM) per process would
    # oversubscribe the box P-fold. Override via env for solo runs.
    con.sql(f"SET threads TO {os.environ.get('SWEEP_DUCKDB_THREADS', '4')}")
    con.sql(f"SET memory_limit = '{os.environ.get('SWEEP_DUCKDB_MEM', '12GB')}'")
    # per-process spill dir: P concurrent compares all spilling to the
    # default cwd-relative .tmp abort each other (one process GCs another
    # process's duckdb_temp_storage-*.tmp -> IO error / SIGABRT).
    # Removed on exit — a big oracle can spill tens of GB.
    # atexit does NOT fire on timeout(1)'s SIGTERM — and the TIMEOUT case
    # is exactly the one most likely to have spilled tens of GB. Convert
    # SIGTERM into a normal interpreter exit so atexit runs.
    import atexit, shutil, signal, tempfile
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    tmp = tempfile.mkdtemp(prefix="sweep_duck_")
    atexit.register(shutil.rmtree, tmp, True)
    con.sql(f"SET temp_directory = '{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    # same staleness guard as compare_oracle.py: the dump must carry the
    # stamp of the CURRENT catalog entry (Verify re-stamps on success)
    stamp_path = f"{out_dir}/{name}/_oracle_sha1"
    want_sha = hashlib.sha1(sql.encode("utf-8")).hexdigest()
    got_sha = (open(stamp_path).read().strip()
               if os.path.exists(stamp_path) else None)
    if got_sha != want_sha:
        print(f"FAIL {name}: stale dump (stamp {got_sha and got_sha[:8]} != "
              f"catalog {want_sha[:8]} -- re-run Verify for this query)")
        return 1
    got = con.sql(f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
    gcols = sorted(got.columns)
    gdf = got.df()[gcols]
    want = con.sql(sql)
    wdf = want.df()[sorted(want.columns)]
    if list(gdf.columns) != list(wdf.columns):
        print(f"FAIL {name}: cols {list(gdf.columns)} vs {list(wdf.columns)}")
        return 1
    if len(gdf) != len(wdf):
        print(f"FAIL {name}: rows {len(gdf)} vs {len(wdf)}")
        return 1
    for c in gdf.columns:
        ga = [pack(x) for x in gdf[c].tolist()]
        wa = [pack(x) for x in wdf[c].tolist()]
        if ga != wa:
            bad = [(i, ga[i], wa[i]) for i in range(len(ga)) if ga[i] != wa[i]][:3]
            print(f"FAIL {name}: col {c} diff {bad}")
            return 1
    print(f"PASS {name} ({len(gdf)} rows)")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
