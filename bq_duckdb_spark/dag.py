"""DAG pipeline: register / infer deps / topo-sort / run / retry.

Re-implements the reference's orchestration layer
(src/session/pipeline.rs) — the one subsystem the reference implements
itself rather than delegating to its SQL engine:

- G1 register: upsert defs, classify source (no SQL) vs derived, re-infer
  every table's dependencies after each batch so forward references
  resolve (pipeline.rs:114-172).
- G4 topo sort into levels, alphabetical within a level, "Circular
  dependency detected" on cycles (pipeline.rs:424-481).
- G5 serial deterministic run / G6 worker-pool parallel run capped at
  ``max_concurrency`` (default 8, pipeline.rs:48,254-346).
- G7 target-subset closure (pipeline.rs:394-414), G10 retry of
  failed+skipped (manager.rs:102-160), G8/G9 materialization semantics:
  derived = full snapshot replace; source = create-if-not-exists +
  append rows on re-run (pipeline.rs:511-593; dag_test.clj:240-258).
"""

from __future__ import annotations

import threading
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field

from bq_duckdb_spark.dialect import extract_dependencies

DEFAULT_MAX_CONCURRENCY = 8


@dataclass
class PipelineTable:
    name: str
    sql: str | None = None
    columns: list[dict] | None = None  # BQ ColumnDef dicts (source tables)
    rows: list | None = None
    dependencies: list[str] = field(default_factory=list)
    # dbt-style data tests (extension beyond the reference): run after
    # the table materializes; any violation fails the table, and the
    # existing failure machinery skips its transitive dependents
    tests: list[dict] = field(default_factory=list)

    @property
    def is_source(self) -> bool:
        return self.sql is None


class DataTestFailure(Exception):
    """A table materialized but violated one of its data tests."""


@dataclass
class PipelineResult:
    success: bool
    succeeded: list[str] = field(default_factory=list)
    failed: list[dict] = field(default_factory=list)  # {"table":…, "error":…}
    skipped: list[str] = field(default_factory=list)

    reused: list[str] = field(default_factory=list)  # incremental runs only

    def to_dict(self) -> dict:
        d = {
            "success": self.success,
            "succeededTables": self.succeeded,
            "failedTables": self.failed,
            "skippedTables": self.skipped,
        }
        # extension key, present only on incremental runs — the plain-run
        # wire shape stays byte-identical to the reference's
        if self.reused:
            d["reusedTables"] = self.reused
        return d


class Pipeline:
    def __init__(self, session, materialize_mode: str = "table"):
        self.session = session
        self.tables: dict[str, PipelineTable] = {}  # key: name as registered
        self._lock = threading.RLock()
        self.materialize_mode = materialize_mode
        # incremental-run bookkeeping (beyond the reference): fingerprint
        # at last successful materialization per derived table, and a
        # monotone version per source bumped on every append
        self._last_fp: dict[str, str] = {}
        self._source_versions: dict[str, int] = {}

    # -- registration (G1/G2) ----------------------------------------------

    def register(self, defs: list[dict]) -> dict:
        """Upsert table definitions. Each def: {"name", "sql"?, "schema"?,
        "rows"?}. After the batch, dependencies are re-inferred for EVERY
        registered table so forward references resolve regardless of
        registration order (pipeline.rs:114-172)."""
        with self._lock:
            for d in defs:
                name = d["name"]
                self.tables[self._canonical(name)] = PipelineTable(
                    name=name,
                    sql=d.get("sql"),
                    columns=d.get("schema"),
                    rows=d.get("rows"),
                    tests=d.get("tests") or [],
                )
            self._reinfer_all_dependencies()
            return self.get_dag()

    def _canonical(self, name: str) -> str:
        # case-insensitive matching (pipeline.rs:1541-1554) — keep the
        # registered spelling in the value, match on lower-case key
        for key in self.tables:
            if key.lower() == name.lower():
                return key
        return name

    def _reinfer_all_dependencies(self) -> None:
        known = [t.name for t in self.tables.values()]
        for t in self.tables.values():
            if t.is_source:
                t.dependencies = []
            else:
                deps = extract_dependencies(t.sql, known)
                t.dependencies = [d for d in deps if d.lower() != t.name.lower()]

    # -- topo sort (G4) ----------------------------------------------------

    def topological_sort_levels(self, subset: set[str] | None = None) -> list[list[str]]:
        """Kahn's algorithm into levels; alphabetical within a level for
        deterministic serial order (pipeline.rs:424-481; determinism
        asserted by manager.rs:999-1004)."""
        with self._lock:
            names = {t.name for t in self.tables.values()}
            if subset is not None:
                names = {n for n in names if n in subset}
            indeg = {}
            dependents: dict[str, list[str]] = {n: [] for n in names}
            for n in names:
                t = self.tables[self._canonical(n)]
                deps = [d for d in t.dependencies if d in names]
                indeg[n] = len(deps)
                for d in deps:
                    dependents[d].append(n)
            levels = []
            ready = sorted([n for n in names if indeg[n] == 0], key=str.lower)
            seen = 0
            while ready:
                levels.append(ready)
                seen += len(ready)
                nxt = []
                for n in ready:
                    for m in dependents[n]:
                        indeg[m] -= 1
                        if indeg[m] == 0:
                            nxt.append(m)
                ready = sorted(nxt, key=str.lower)
            if seen != len(names):
                raise ValueError("Circular dependency detected")
            return levels

    # -- target closure (G7) -----------------------------------------------

    def _closure(self, targets: list[str]) -> set[str]:
        with self._lock:
            out: set[str] = set()
            stack = [self._canonical(t) for t in targets]
            while stack:
                key = stack.pop()
                t = self.tables.get(self._canonical(key))
                if t is None or t.name in out:
                    continue
                out.add(t.name)
                stack.extend(t.dependencies)
            return out

    # -- execution (G5/G6/G8/G9) -------------------------------------------

    def run(
        self,
        targets: list[str] | None = None,
        retry_count: int = 0,
        parallel: bool = False,
        max_concurrency: int = DEFAULT_MAX_CONCURRENCY,
    ) -> PipelineResult:
        subset = self._closure(targets) if targets else None
        result = self._run_subset(subset, parallel, max_concurrency)
        for _ in range(retry_count):
            if result.success:
                break
            retry_set = {f["table"] for f in result.failed} | set(result.skipped)
            retry_res = self._run_subset(retry_set, parallel, max_concurrency)
            merged_succeeded = sorted(
                set(result.succeeded) | set(retry_res.succeeded), key=str.lower
            )
            result = PipelineResult(
                success=retry_res.success,
                succeeded=merged_succeeded,
                failed=retry_res.failed,
                skipped=retry_res.skipped,
            )
        return result

    def run_incremental(
        self,
        targets: list[str] | None = None,
        parallel: bool = False,
        max_concurrency: int = DEFAULT_MAX_CONCURRENCY,
    ) -> PipelineResult:
        """Incremental DAG run (beyond the reference): recompute ONLY the
        derived tables whose inputs changed — an unchanged-SQL table all
        of whose transitive sources are unchanged is REUSED as-is.

        Change tracking is a recursive content fingerprint:
        ``fp(derived) = sha1(sql, fp(dep)...)`` and ``fp(source) =
        its append-version`` (bumped every time a source def with rows
        executes — reference semantics append on every run, so a source
        registered WITH rows is always "new data" and a source def
        without rows never dirties its dependents). A changed SQL or a
        fresh append therefore invalidates exactly the downstream
        closure, transitively, with no explicit edge walk. Fingerprints
        commit only on successful materialization, so a failed table
        stays stale and re-runs next time.

        At 100 TB this is the difference between re-running one branch
        and re-running the warehouse; the fingerprint map is
        tables-sized driver state.
        """
        with self._lock:
            subset = self._closure(targets) if targets else set(self.tables.keys())
            result = PipelineResult(success=True)
            # 1. sources with pending rows append (reference run semantics)
            for key in sorted(subset, key=str.lower):
                t = self.tables[self._canonical(key)]
                if not t.is_source:
                    continue
                if t.rows:
                    try:
                        self.execute_table(t)
                        self._source_versions[self._canonical(key)] = (
                            self._source_versions.get(self._canonical(key), 0) + 1
                        )
                        result.succeeded.append(t.name)
                    except Exception as e:
                        result.failed.append({"table": t.name, "error": str(e)})
                else:
                    # ensure the (empty) source table exists for dependents
                    self.session.create_table(
                        t.name, t.columns or [], if_not_exists=True
                    )
            # 2. fingerprint every subset member against the last run
            memo: dict[str, str] = {}
            stale = {
                key
                for key in subset
                if not self.tables[self._canonical(key)].is_source
                and self._fingerprint(key, memo) != self._last_fp.get(self._canonical(key))
            }
            result.reused = sorted(
                (
                    self.tables[self._canonical(k)].name
                    for k in subset
                    if not self.tables[self._canonical(k)].is_source and k not in stale
                ),
                key=str.lower,
            )
            # 3. recompute only the stale closure, normal skip semantics
            if stale:
                sub_res = self._run_subset(stale, parallel, max_concurrency)
                result.succeeded = sorted(
                    set(result.succeeded) | set(sub_res.succeeded), key=str.lower
                )
                result.failed.extend(sub_res.failed)
                result.skipped = sub_res.skipped
                for name in sub_res.succeeded:
                    key = self._canonical(name)
                    if not self.tables[key].is_source:
                        self._last_fp[key] = memo[key] if key in memo else (
                            self._fingerprint(key, memo)
                        )
            result.success = not result.failed and not result.skipped
            return result

    def _fingerprint(self, name: str, memo: dict[str, str]) -> str:
        import hashlib

        key = self._canonical(name)
        if key in memo:
            return memo[key]
        t = self.tables[key]
        if t.is_source:
            fp = f"src:{self._source_versions.get(key, 0)}"
        else:
            dep_fps = ",".join(
                self._fingerprint(d, memo) for d in sorted(t.dependencies)
            )
            fp = hashlib.sha1(
                (t.sql or "").encode() + b"|" + dep_fps.encode()
            ).hexdigest()
        memo[key] = fp
        return fp

    def retry_failed(self, prev: PipelineResult, parallel: bool = False) -> PipelineResult:
        """Standalone ``bq.retryDag`` (pipeline.rs:188-201)."""
        retry_set = {f["table"] for f in prev.failed} | set(prev.skipped)
        if not retry_set:
            return PipelineResult(success=True, succeeded=prev.succeeded)
        res = self._run_subset(retry_set, parallel, DEFAULT_MAX_CONCURRENCY)
        res.succeeded = sorted(set(prev.succeeded) | set(res.succeeded), key=str.lower)
        return res

    def _run_subset(
        self, subset: set[str] | None, parallel: bool, max_concurrency: int
    ) -> PipelineResult:
        levels = self.topological_sort_levels(subset)
        if parallel:
            return self._run_streaming(levels, max_concurrency)
        return self._run_serial(levels)

    def _run_serial(self, levels: list[list[str]]) -> PipelineResult:
        """Level-by-level, alphabetical — strictly deterministic
        (pipeline.rs:222-252)."""
        result = PipelineResult(success=True)
        blocked: set[str] = set()
        for level in levels:
            for name in level:  # already alphabetical
                t = self.tables[self._canonical(name)]
                if any(d in blocked for d in t.dependencies):
                    result.skipped.append(name)
                    blocked.add(name)
                    continue
                try:
                    self.execute_table(t)
                    result.succeeded.append(name)
                except Exception as e:
                    result.failed.append({"table": name, "error": str(e)})
                    blocked.add(name)
        result.success = not result.failed and not result.skipped
        return result

    def _run_streaming(self, levels: list[list[str]], max_concurrency: int) -> PipelineResult:
        """Worker-pool run: up to ``max_concurrency`` tables in flight; as
        each completes, newly-ready tables spawn; a failure immediately
        skips all transitive dependents (pipeline.rs:254-381). Spark's
        scheduler is thread-safe, so concurrent ``spark.sql`` actions
        simply become concurrent jobs."""
        names = [n for lvl in levels for n in lvl]
        name_set = set(names)
        pending_deps = {
            n: {d for d in self.tables[self._canonical(n)].dependencies if d in name_set}
            for n in names
        }
        dependents: dict[str, set[str]] = {n: set() for n in names}
        for n in names:
            for d in pending_deps[n]:
                dependents[d].add(n)
        result = PipelineResult(success=True)
        blocked: set[str] = set()
        futures = {}
        done_set: set[str] = set()

        def skip_transitively(root: str):
            stack = list(dependents[root])
            while stack:
                m = stack.pop()
                if m in blocked or m in done_set:
                    continue
                blocked.add(m)
                result.skipped.append(m)
                stack.extend(dependents[m])

        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            ready = sorted([n for n in names if not pending_deps[n]], key=str.lower)
            for n in ready:
                futures[pool.submit(self.execute_table, self.tables[self._canonical(n)])] = n
            while futures:
                done, _ = wait(list(futures), return_when=FIRST_COMPLETED)
                for fut in done:
                    n = futures.pop(fut)
                    done_set.add(n)
                    err = fut.exception()
                    if err is not None:
                        result.failed.append({"table": n, "error": str(err)})
                        skip_transitively(n)
                    else:
                        result.succeeded.append(n)
                        for m in sorted(dependents[n], key=str.lower):
                            if m in blocked:
                                continue
                            pending_deps[m].discard(n)
                            if not pending_deps[m]:
                                futures[
                                    pool.submit(
                                        self.execute_table, self.tables[self._canonical(m)]
                                    )
                                ] = m
        result.success = not result.failed and not result.skipped
        return result

    def execute_table(self, t: PipelineTable) -> None:
        """Materialize one table (pipeline.rs:511-593).

        derived: full snapshot replace (DROP + CREATE from query result in
        the reference → one ``materialize`` here).
        source: create-if-not-exists + INSERT rows — re-running a source
        registration APPENDS (dag_test.clj:240-258).
        """
        if t.is_source:
            self.session.create_table(t.name, t.columns or [], if_not_exists=True)
            if t.rows:
                self.session.insert(t.name, t.rows)
        else:
            df = self.session.query(t.sql)
            self.session.materialize(t.name, df, mode=self.materialize_mode)
        self._run_table_tests(t)

    # -- data tests (extension beyond the reference) -----------------------

    @staticmethod
    def _qident(name: str) -> str:
        """Backtick-quote one identifier (backticks doubled)."""
        return "`" + name.replace("`", "``") + "`"

    def _table_columns(self, table: str) -> list[str] | None:
        """Registered column names for ``table`` (None if unresolvable —
        validation is then skipped rather than failing the test run)."""
        key = self.session._resolve_key(table)
        if key is None:
            return None
        return [c["name"] for c in self.session.tables[key].columns or []]

    def _test_sql(self, table: str, rule: dict) -> tuple[str, str]:
        """(rule label, SQL returning ONE violation count). Rule kinds
        mirror ext/validate.py; `expression` is a per-row predicate
        every row must satisfy (the dbt convention).

        Rule column names are validated against the table's registered
        schema and backtick-quoted before interpolation, so names with
        quotes/spaces/dots are safe. The raw `expression` predicate is
        TRUSTED CONFIG (like a dbt test body): whoever can write the
        pipeline definition already controls the SQL the DAG runs."""
        kind = rule.get("type")
        known = self._table_columns(table)

        # case-insensitive like Spark's (and BigQuery's) column resolution
        known_ci = None if known is None else {c.lower() for c in known}

        def check(cols: list[str]) -> None:
            if known_ci is None:
                return
            for c in cols:
                if c.lower() not in known_ci:
                    raise ValueError(
                        f"data test on {table} references unknown column {c!r}"
                    )

        if kind == "unique":
            check(rule["columns"])
            cols = ", ".join(self._qident(c) for c in rule["columns"])
            return (
                "unique:" + ",".join(rule["columns"]),
                f"SELECT coalesce(sum(n - 1), 0) FROM "
                f"(SELECT count(*) AS n FROM {table} GROUP BY {cols})",
            )
        if kind == "not_null":
            cols = rule["columns"]
            check(cols)
            cond = " OR ".join(f"{self._qident(c)} IS NULL" for c in cols)
            return (
                "not_null:" + ",".join(cols),
                f"SELECT count(*) FROM {table} WHERE {cond}",
            )
        if kind == "accepted_values":
            col = rule["column"]
            check([col])
            qcol = self._qident(col)
            vals = ", ".join(
                "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) else str(v)
                for v in rule["values"]
            )
            return (
                f"accepted:{col}",
                f"SELECT count(*) FROM {table} "
                f"WHERE {qcol} IS NOT NULL AND {qcol} NOT IN ({vals})",
            )
        if kind == "expression":
            pred = rule["predicate"]
            return (
                rule.get("name", f"expression:{pred}"),
                f"SELECT count(*) FROM {table} WHERE NOT ({pred})",
            )
        raise ValueError(f"unknown data-test type: {kind!r}")

    def _run_table_tests(self, t: PipelineTable) -> None:
        for rule in t.tests:
            label, sql = self._test_sql(t.name, rule)
            n = self.session.query(sql).collect()[0][0]
            if n:
                raise DataTestFailure(
                    f"data test failed on {t.name}: {label} "
                    f"({n} violation{'s' if n != 1 else ''})"
                )

    # -- introspection (G11/G12) -------------------------------------------

    def get_dag(self) -> dict:
        with self._lock:
            return {
                "tables": [
                    {
                        "name": t.name,
                        "isSource": t.is_source,
                        "dependencies": list(t.dependencies),
                    }
                    for t in self.tables.values()
                ]
            }

    def clear(self) -> None:
        """Drop every registered table, then empty the registry
        (pipeline.rs:483-502)."""
        with self._lock:
            for t in self.tables.values():
                try:
                    self.session.drop_table(t.name, if_exists=True)
                except Exception:
                    pass
            self.tables.clear()
            self._last_fp.clear()
            self._source_versions.clear()
