#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads Verify output (<outDir>/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf tables, and compares row count, column
names, and cell values (after sorting columns by name, like the driver).

Usage: compare_oracle.py <sfDir> <verifyOutDir> [--allow-skips]

Exit code is nonzero on any FAIL, on any STALE dump (a dump whose
_oracle_sha1 stamp does not match the current catalog entry -- i.e. it was
produced before an oracle-SQL change, or by a run where the query errored
after a previous successful dump), and on nonzero skips unless
--allow-skips is given (skips are expected ONLY for deliberately filtered
local Verify runs; in a full-registry run a missing dump means the query
ERRORED in Verify -- round-9 medium advice).
"""
import hashlib, json, math, os, struct, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Bit-exact: the driver's hash distinguishes -0.0 from +0.0 (and
        # every ulp); Python's == does not, so compare the IEEE bytes.
        return struct.pack("<d", v)
    return v


def main(sf_dir, out_dir, allow_skips=False):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata tables are single parquet FILES; Spark-written
        # dirs (e.g. the graft.Stress output) need a part-file glob
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            # no dump for this catalog entry: fine for a deliberately
            # filtered Verify run (--allow-skips), an ERROR in a full one
            n_skip += 1
            continue
        # stamp check: the dump must have been produced against the
        # CURRENT oracle SQL by a run that completed this query (Verify
        # un-stamps before attempting and re-stamps on success)
        stamp_path = f"{out_dir}/{name}/_oracle_sha1"
        want = hashlib.sha1(sql.encode("utf-8")).hexdigest()
        got_stamp = (open(stamp_path).read().strip()
                     if os.path.exists(stamp_path) else None)
        if got_stamp != want:
            print(f"FAIL {name}: stale dump "
                  f"(stamp {got_stamp and got_stamp[:8]} != catalog {want[:8]}"
                  " -- re-run Verify for this query)")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            gcols = sorted(got.columns)
            gdf = got.df()[gcols]
            exp = con.sql(sql)
            ecols = sorted(exp.columns)
            edf = exp.df()[ecols]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        # Driver-hash proxy: the driver canonicalizes values by dtype, so a
        # DuckDB HUGEINT (object/float128 fallback) or DECIMAL (object of
        # decimal.Decimal) vs Spark's int64/float64 fails the hash even at
        # equal values. Flag any dtype divergence or decimal/object numerics.
        # Integer width (int32 vs int64) is canonicalized by the driver —
        # round-1 evidence: q13/q36/q47 etc. were hash-green with int32
        # Spark vs int64 DuckDB. Only cross-family drift and non-native
        # numerics (HUGEINT/DECIMAL -> object) fail.
        import decimal

        def family(dt):
            d = str(dt)
            if d.startswith(("int", "uint")):
                return "int"
            if d.startswith("float"):
                return "float"
            if d.startswith("datetime"):
                return "datetime"
            return d
        for c in (gcols if gcols == ecols else []):
            gf, ef = family(gdf[c].dtype), family(edf[c].dtype)
            if gf != ef:
                ok = False
                msgs.append(f"dtype {c}: spark={gdf[c].dtype} oracle={edf[c].dtype}")
            if ef == "object" and len(edf) and isinstance(
                    edf[c].iloc[0], decimal.Decimal):
                ok = False
                msgs.append(f"col {c}: oracle emits decimal.Decimal")
        if gcols != ecols:
            ok, msgs = False, [f"cols {gcols} vs {ecols}"]
        elif len(gdf) != len(edf):
            ok, msgs = False, [f"rows {len(gdf)} vs {len(edf)}"]
        else:
            for c in gcols:
                gv = [norm(x) for x in gdf[c].tolist()]
                ev = [norm(x) for x in edf[c].tolist()]
                if gv != ev:
                    diffs = [(i, a, b) for i, (a, b) in
                             enumerate(zip(gv, ev)) if a != b][:3]
                    ok = False
                    msgs.append(f"col {c} diff {diffs}")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(gdf)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(msgs))
    skip = f" / {n_skip} skipped (no dump)" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skip} ==")
    if n_skip and not allow_skips:
        print(f"ERROR: {n_skip} catalog entries have no dump and "
              "--allow-skips was not given (full-registry compare with "
              "missing dumps == queries errored in Verify)")
        return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  allow_skips="--allow-skips" in sys.argv[3:]))
