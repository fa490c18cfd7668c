#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's correctness gate; NOT part of the
shipped library). Usage:

    python3 scripts/dev_check.py <sfDir> <outDir> [--json PATH] [--no-memo]
                                 [--fast] [query ...]

Reads each <outDir>/<name> parquet dump written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir tables, and compares sorted rows/columns. Keys present in the dump
but absent from the oracle map are recorded as `no_oracle` rows-only
entries, so the artifact enumerates the FULL contract surface like the
driver's CORRECTNESS_r{N}.json does.

Evidence is CRASH-PROOF (round-12 lesson: the whole round's correctness
artifact came back `{}` because the gate process died once): per-key
results stream into --json PATH (default <outDir>/correctness_local.json),
rewritten atomically and flushed after EVERY key, each entry carrying the
driver's fields (rows_match/schema_match/hash_match/spark_rows/oracle_rows/
err) plus per-key `oracle_sec`/`compare_sec` wall-times so a budget blower
is identifiable from the artifact alone.

DuckDB memory is capped (GATE_DUCK_MEM, default 12GB at dev scale — raise
for sf1+) so an over-budget recursive-CTE oracle raises a catchable per-key
error instead of inviting the OOM killer to take down the whole gate.

STAGED oracle execution (default): every WITH-chain oracle runs as a
sequence of CTE-at-a-time temp-table materializations plus a stripped
tail, with a chain-keyed cache sharing identical prefixes across queries
(the capstone/backtest families restate long identical WITH prefixes —
corpus_pipeline v2/v3/v4 share 12-13 CTEs). Semantically identical: CTEs
are pure, remaining references resolve to the temp tables, and a CTE
shadows a same-named temp table, so a query defining its own different
`base` is unaffected (verified: no CTE name collides with a base table).
It is also both the memory fix and the speed fix: DuckDB's monolithic
evaluation of the 40-CTE recursive capstone oracle needs >12GB and ~10
minutes at sf0.01 (OOM under the cap), while the same query staged runs
in ~1s under the cap, hash-identical. --no-memo disables staging for A/B
equivalence checks.

--fast skips keys whose oracle took longer than GATE_FAST_MAX_SEC (default
5s) in the previous run recorded at --json PATH (marked `skipped_fast`,
not a failure) — the quick-iteration tier; the full run stays the gate.
"""
import hashlib
import json
import os
import re
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame, name: str) -> dict:
    """Driver-style per-key verdict: rows/schema/hash (value) match flags."""
    r = {"rows_match": len(a) == len(b),
         "schema_match": list(a.columns) == list(b.columns),
         "hash_match": None,
         "spark_rows": len(a), "oracle_rows": len(b), "err": None}
    if not r["schema_match"]:
        print(f"[{name}] SCHEMA mismatch: spark={list(a.columns)} oracle={list(b.columns)}")
    if not r["rows_match"]:
        print(f"[{name}] ROWS mismatch: spark={len(a)} oracle={len(b)}")
    if not (r["rows_match"] and r["schema_match"]):
        r["hash_match"] = False
        return r
    ok = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # exact compare: both sides round() their outputs, so any residual
            # difference is a real cross-engine drift the driver's hash would
            # also see
            bad = ~(
                (av.isna() & bv.isna())
                | (av.astype(float) == bv.astype(float))
            )
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        if bad.any():
            i = bad.idxmax()
            print(f"[{name}] VALUE mismatch col={c} row={i}: spark={av[i]!r} oracle={bv[i]!r} ({int(bad.sum())} rows)")
            ok = False
    r["hash_match"] = ok
    if ok:
        print(f"[{name}] OK ({len(a)} rows, {len(a.columns)} cols)")
    return r


# ---------------------------------------------------------------- CTE memo

_IDENT = re.compile(
    r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^()]*\))?\s+AS\s*\(")


def _strip_comments(sql: str):
    """Remove `--` line comments and `/* */` block comments OUTSIDE string
    literals (tracking ''-escaped quotes), so an apostrophe in a comment
    can't desync the CTE scan's literal tracking and a comment between CTE
    list items can't truncate the list. Returns None on an unterminated
    literal/block comment (caller runs the SQL unmodified)."""
    out, i, n = [], 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while True:
                if j >= n:
                    return None
                if sql[j] == "'" and sql[j + 1:j + 2] == "'":
                    j += 2
                elif sql[j] == "'":
                    j += 1
                    break
                else:
                    j += 1
            out.append(sql[i:j])
            i = j
        elif c == "-" and sql[i + 1:i + 2] == "-":
            while i < n and sql[i] != "\n":
                i += 1
        elif c == "/" and sql[i + 1:i + 2] == "*":
            k = sql.find("*/", i + 2)
            if k < 0:
                return None
            i = k + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def split_ctes(sql: str):
    """Parse `WITH [RECURSIVE] n1 AS (...), n2(cols) AS (...) <tail>` into
    (recursive, [(name, col_alias, body)...], tail) — col_alias is '' or
    the literal '(id, root)' column list. Comments are stripped first (see
    [[_strip_comments]]). Returns None when the query has no WITH clause
    or the scan fails (caller runs the SQL unmodified). The paren balance
    scan skips ''-escaped string literals."""
    sql = _strip_comments(sql)
    if sql is None:
        return None
    s = sql.strip()
    if not s[:4].upper() == "WITH":
        return None
    i = 4
    m = re.match(r"\s*RECURSIVE\b", s[i:], re.I)
    recursive = bool(m)
    if m:
        i += m.end()
    ctes = []
    try:
        while True:
            m = _IDENT.match(s, i)
            if not m:
                return None
            name, alias, j = m.group(1), m.group(2) or "", m.end()
            depth, k = 1, j
            while depth > 0:
                c = s[k]
                if c == "'":
                    k += 1
                    while True:
                        if s[k] == "'" and s[k + 1:k + 2] == "'":
                            k += 2
                        elif s[k] == "'":
                            k += 1
                            break
                        else:
                            k += 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                k += 1
            ctes.append((name, alias, s[j:k - 1]))
            kk = k
            while kk < len(s) and s[kk].isspace():
                kk += 1
            if kk < len(s) and s[kk] == ",":
                i = kk + 1
            else:
                return (recursive, ctes, s[kk:])
    except IndexError:
        return None


def _normb(body: str) -> str:
    return re.sub(r"\s+", " ", body.strip())


def _chains(ctes):
    """Cumulative chain keys: hash of the normalized (name, alias, body)
    prefix up to and including CTE i — equal keys mean equal temp-table
    contents."""
    out, h = [], hashlib.md5()
    for name, alias, body in ctes:
        h.update(f"{name}\x00{_normb(alias)}\x00{_normb(body)}\x01".encode())
        out.append(h.hexdigest())
    return out


def ensure_prefix(con, cache: dict, ctes, chains, upto: int):
    """Materialize up to the first `upto` CTEs as temp tables (reusing any
    whose chain key already matches). A CTE referencing a LATER CTE of its
    own query (mutual recursion) fails to bind — staging stops there and
    the remainder stays inline, which is exact where a textual forward-
    reference scan false-positives on column names. Before creating, any
    cached temp table whose name collides with one of THIS query's CTEs
    under a different chain is dropped, so a forward reference can never
    silently bind to a stale table. Returns (staged_depth, n_created)."""
    qchain = {name: chains[i] for i, (name, _, _) in enumerate(ctes)}
    for name, ck in list(cache.items()):
        if name in qchain and qchain[name] != ck:
            con.execute(f'DROP TABLE IF EXISTS "{name}"')
            cache.pop(name, None)
    created = 0
    for i in range(upto):
        name, alias, body = ctes[i]
        if name.lower() in (t.lower() for t in TABLES):
            # a CTE named like a base table would, once materialized as a
            # temp table, shadow the table VIEW for every later query on
            # this connection (temp schema wins DuckDB name resolution) —
            # enforce the no-collision invariant instead of assuming it
            return i, created
        if cache.get(name) == chains[i]:
            continue
        self_rec = re.search(rf"\b{re.escape(name)}\b", body)
        if alias or self_rec:
            # column alias and/or self-recursion: materialize through a
            # (recursive-tolerant) wrapper preserving the declared columns
            stmt = (f'CREATE TEMP TABLE "{name}" AS WITH RECURSIVE '
                    f"{name}{alias} AS ({body}) SELECT * FROM {name}")
        else:
            stmt = f'CREATE TEMP TABLE "{name}" AS {body}'
        try:
            con.execute(stmt)
        except duckdb.Error as e:
            if isinstance(e, (duckdb.BinderException, duckdb.CatalogException)):
                return i, created  # forward reference: stop staging here
            raise
        cache[name] = chains[i]
        created += 1
    return upto, created


def strip_prefix(parsed_entry, upto: int) -> str:
    recursive, ctes, tail = parsed_entry
    rest = ctes[upto:]
    if not rest:
        return tail
    kw = "WITH RECURSIVE " if recursive else "WITH "
    return kw + ", ".join(f"{n}{a} AS ({b})" for n, a, b in rest) + " " + tail


def staged_sql(con, cache: dict, sql: str):
    """FULLY stage a WITH-chain oracle: materialize every CTE as a temp
    table (chain-keyed cache shares identical prefixes across queries) and
    run only the stripped tail. Semantically identical (CTEs are pure; a
    remaining CTE shadows a same-named temp table), but each stage's
    memory releases before the next starts and spills independently — the
    monolithic ~29-CTE recursive capstone plan can exceed the memory cap
    while its stages individually fit. Staging stops at the first CTE that
    fails to BIND (true forward reference / mutual recursion); column-
    aliased and self-recursive CTEs stage through a recursive wrapper.
    Returns (sql_to_run, n_staged). Used as the dev-gate's OOM retry path
    and as the sf1/sf10 gates' default execution mode."""
    pe = split_ctes(sql)
    if not pe:
        return sql, 0
    _, ctes, _ = pe
    depth, made = ensure_prefix(con, cache, ctes, _chains(ctes), len(ctes))
    return strip_prefix(pe, depth), made


# ----------------------------------------------------------------- driver

def write_json(path: Path, results: dict) -> None:
    tmp = path.with_suffix(".tmp")
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    no_memo = "--no-memo" in args
    fast = "--fast" in args
    args = [a for a in args if a not in ("--no-memo", "--fast")]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = Path(args[i + 1])
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    if json_path is None:
        json_path = Path(out_dir, "correctness_local.json")

    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    prev = {}
    if fast and json_path.exists():
        prev = json.loads(json_path.read_text())
    fast_max = float(os.environ.get("GATE_FAST_MAX_SEC", "5"))

    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('GATE_DUCK_MEM', '12GB')}'")
    # in-memory connections have no default spill location — without one the
    # memory cap turns an over-budget oracle into a hard error instead of
    # letting it spill and finish
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # full contract surface = every dumped key (rows-only keys included)
    dumped = sorted(d.name for d in Path(out_dir).iterdir()
                    if d.is_dir() and not d.name.startswith("_"))
    keys = [k for k in sorted(set(dumped) | set(oracle))
            if not only or k in only]


    results = {}
    if only and json_path.exists():
        # partial re-run: merge into the existing artifact instead of
        # clobbering the other keys' committed verdicts (sf1_gate pattern)
        results = json.loads(json_path.read_text())
    results["_meta"] = {"sf_dir": sf_dir, "out_dir": out_dir,
                        "memo": not no_memo, "fast": fast,
                        "duck_mem": os.environ.get("GATE_DUCK_MEM", "12GB"),
                        "started_unix": time.time(), "n_keys": len(keys)}
    cache = {}
    n_ok = n_fail = n_rows_only = n_skip = 0
    t_gate = time.time()
    for name in keys:
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None,
                 "oracle_sec": None, "compare_sec": None}
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"[{name}] MISSING spark output")
            entry["err"] = "missing_spark_output"
            n_fail += 1
        elif name not in oracle:
            # wrapped like the oracle branch: one truncated/half-written
            # dump dir must cost one key's record, never the rest of the
            # gate loop; and 0 rows FAILS, as in the sf1/sf10 gates — an
            # operator regressed to an empty frame is a red key, not a pass
            try:
                entry["spark_rows"] = len(pd.read_parquet(spark_dir))
                entry["err"] = "no_oracle"
                if entry["spark_rows"] == 0:
                    n_fail += 1
                    print(f"[{name}] FAIL rows-only: 0 rows")
                else:
                    n_rows_only += 1
                    print(f"[{name}] rows-only ({entry['spark_rows']} rows)")
            except Exception as e:  # noqa: BLE001
                entry["err"] = f"no_oracle; read failed: {str(e)[:150]}"
                n_fail += 1
                print(f"[{name}] FAIL rows-only: {entry['err']}")
        elif fast and (prev.get(name, {}).get("oracle_sec") or 0) > fast_max:
            # keep the recorded slow timing so the NEXT --fast run still
            # knows to skip (a None would make the skip one-shot)
            entry["err"] = "skipped_fast"
            entry["oracle_sec"] = prev[name]["oracle_sec"]
            n_skip += 1
            print(f"[{name}] skipped (--fast: previous oracle took "
                  f"{prev[name]['oracle_sec']:.1f}s)")
        else:
            try:
                t0 = time.time()
                sql = oracle[name]
                if not no_memo:
                    sql, staged = staged_sql(con, cache, sql)
                    if staged:
                        entry["staged_ctes"] = staged
                b = norm(con.sql(sql).df())
                entry["oracle_sec"] = round(time.time() - t0, 3)
                t1 = time.time()
                a = norm(pd.read_parquet(spark_dir))
                entry.update(compare(a, b, name))
                entry["compare_sec"] = round(time.time() - t1, 3)
                if entry["hash_match"]:
                    n_ok += 1
                else:
                    n_fail += 1
            except Exception as e:  # duckdb OOM/engine limit: per-key, not fatal
                entry["err"] = f"oracle_error: {type(e).__name__}: {e}"[:500]
                entry["oracle_sec"] = round(time.time() - t0, 3)
                print(f"[{name}] ORACLE ERROR: {e}")
                n_fail += 1
        results[name] = entry
        write_json(json_path, results)  # flush after EVERY key

    results["_meta"]["wall_sec"] = round(time.time() - t_gate, 1)
    results["_meta"]["n_ok"] = n_ok
    results["_meta"]["n_fail"] = n_fail
    results["_meta"]["n_rows_only"] = n_rows_only
    results["_meta"]["n_skipped_fast"] = n_skip
    write_json(json_path, results)
    print(f"== {n_ok} ok / {n_fail} fail / {n_rows_only} rows-only"
          + (f" / {n_skip} skipped-fast" if n_skip else "")
          + f" == ({results['_meta']['wall_sec']}s, artifact: {json_path})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
