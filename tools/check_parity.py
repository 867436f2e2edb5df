#!/usr/bin/env python3
"""Dev-only parity checker mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same sf parquet tables,
sorts columns by name, and compares row-by-row (values stringified; floats
compared after round-trip through repr). NOT part of the shipped library —
driver-side python is available locally for dev testing only.

Env knobs (all optional, for big-SF sweeps where single-node DuckDB is the
bottleneck, not Spark):
  PARITY_TIMEOUT_SEC   per-oracle DuckDB wall budget; on expiry the query is
                       interrupted and recorded as ORACLE TIMEOUT (the sweep
                       continues). Default: no timeout.
  PARITY_SKIP          comma-separated query names to skip (already verified).
  PARITY_ONLY          comma-separated query names to check (overrides order).
  PARITY_THREADS       DuckDB thread cap (default: all cores).
"""
import sys, os, json, glob, time, threading
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def cell_str(x):
    """Canonical cell string, mirroring the driver's stringified hash.

    NULLs collapse to one token (both engines emit them for the same rows);
    everything else is str() of the python-native value from .tolist(), so
    int 3 -> '3' and float 3.0 -> '3.0' stay distinct -- a dtype divergence
    (e.g. DuckDB HUGEINT -> pandas float64) is a FAILURE, matching the
    driver, even when the values are numerically equal.
    """
    if x is None:
        return "<NULL>"
    if isinstance(x, float) and x != x:
        return "<NULL>"
    try:
        if pd.isna(x):
            return "<NULL>"
    except (TypeError, ValueError):
        pass  # arrays/lists: pd.isna is elementwise; fall through to str()
    return str(x)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to UTC-naive strings, floats via repr
    out = {}
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime"):
            s = s.astype("datetime64[us]").astype(str)
        out[c] = s
    return pd.DataFrame(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    timeout = float(os.environ.get("PARITY_TIMEOUT_SEC", "0"))
    skip = set(filter(None, os.environ.get("PARITY_SKIP", "").split(",")))
    only = list(filter(None, os.environ.get("PARITY_ONLY", "").split(",")))
    threads = os.environ.get("PARITY_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table: a directory of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d))])
    if only:
        names = [n for n in only if os.path.isdir(os.path.join(out_dir, n))]
    n_pass = n_fail = n_timeout = 0
    for name in names:
        if name in skip:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
        if name not in oracle:
            print(f"  {name}: NO ORACLE (rows-only) rows={len(spark_df)}")
            continue
        t0 = time.monotonic()
        timer = None
        # The timer only interrupts while `done` is unset, and `done`
        # is set BEFORE timer.cancel() in the finally — otherwise a
        # timer firing in the race window between query completion and
        # cancel() leaves a pending interrupt that poisons the NEXT
        # query with an immediate InterruptException. `fired` records
        # that the callback ran at all so a just-lost race (callback
        # passed the done check as the query finished) is drained
        # defensively below.
        done = threading.Event()
        fired = threading.Event()

        def _interrupt():
            fired.set()
            if not done.is_set():
                con.interrupt()

        if timeout > 0:
            timer = threading.Timer(timeout, _interrupt)
            timer.start()
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except duckdb.InterruptException:
            print(f"⏱ {name}: ORACLE TIMEOUT after {timeout:.0f}s "
                  f"(DuckDB-side cost; spark rows={len(spark_df)})",
                  flush=True)
            n_timeout += 1
            continue
        except Exception as e:
            if timer is not None and not timer.is_alive():
                print(f"⏱ {name}: ORACLE TIMEOUT after {timeout:.0f}s "
                      f"(DuckDB-side cost; spark rows={len(spark_df)})",
                      flush=True)
                n_timeout += 1
                continue
            print(f"✗ {name}: ORACLE SQL ERROR: {e}", flush=True)
            n_fail += 1
            continue
        finally:
            done.set()
            if timer is not None:
                timer.cancel()
                if fired.is_set():
                    # the callback ran: any interrupt it issued that the
                    # finished query never consumed would hit the next
                    # execute() — drain it on a throwaway statement
                    try:
                        con.execute("SELECT 1").fetchall()
                    except duckdb.InterruptException:
                        pass
        dur = f" [{time.monotonic() - t0:.1f}s]"
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name}: COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"✗ {name}: ROWCOUNT spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        # Row order must match too (driver hashes values in order).
        # HASH-FAITHFUL compare: the driver stringifies every cell before
        # hashing, so int64 3 vs float64 3.0 ('3' vs '3.0') MUST fail here
        # even though they compare == numerically. Rounds 5 and 6 both
        # shipped a driver-red/local-green q62 because this loop used
        # numeric ==; never weaken this back to a tolerance compare.
        mism = None
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                if cell_str(x) != cell_str(y):
                    mism = (c, i, x, y)
                    break
            if mism:
                break
        if mism:
            c, i, x, y = mism
            hint = ""
            try:
                if not (pd.isna(x) or pd.isna(y)) and float(x) == float(y):
                    hint = "  [TYPE-ONLY: values equal, stringify differently" \
                           " -- pin a ::BIGINT/::DOUBLE cast in the oracle]"
            except (TypeError, ValueError):
                pass
            print(f"✗ {name}: VALUE MISMATCH col={c} row={i} "
                  f"spark={x!r} duck={y!r}{hint}", flush=True)
            n_fail += 1
        else:
            print(f"✓ {name}: {len(a)} rows match{dur}", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
