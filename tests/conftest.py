import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (SURVEY.md test plan)."""
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_2k():
    """Deterministic 2k-row corpus with golden columns (FIXTURES.md F1)."""
    from engine import corpus

    return corpus.generate_table(2000)


@pytest.fixture(scope="session")
def models():
    from engine.stages.models import build_models

    return build_models()


def pytest_collection_modifyitems(session, config, items):
    """Run Dataset.join-heavy tests FIRST, before driver-side state
    accumulates.

    Ray 2.49's hash-shuffle join tears its aggregator actors down at
    query completion; a late _map_task completion can race the cancel
    and trip the driver-fatal RAY_CHECK ``task_manager.cc:930 Tried to
    complete task that was not pending``, killing the whole pytest
    process with no report. Both observed crashes (round 4) hit join
    teardown ~480 tests into the session — after >8000 exported task
    specs slow the GCS and widen the race window — while the SAME join
    tests pass reliably early in a fresh session. Ordering is
    otherwise stable (relative order preserved within each class)."""
    join_heavy = ("test_tpch_shapes", "test_concentration_profiles",
                  "test_stages")

    def prio(item):
        mod = item.module.__name__ if item.module else ""
        return 0 if any(mod.startswith(j) for j in join_heavy) else 1

    items.sort(key=prio)


def run_queries_isolated(names, sf_dir, out_dir, kwargs=None, num_cpus=4,
                         attempts=3):
    """Batch variant of run_query_isolated: ONE subprocess Ray session
    runs every query in ``names`` against ``sf_dir`` and writes
    ``<out_dir>/<name>.parquet`` each; returns {name: table}. Collapses
    a parametrized forced-join sweep into a single short-lived session
    (the isolation story is run_query_isolated's docstring).

    RESUMABLE: queries whose parquet already exists are skipped, so if
    the subprocess dies mid-batch (the probabilistic Ray 2.49 join-
    teardown RAY_CHECK), the retry only re-runs the remainder — each
    crash costs one query's work, and ``attempts`` crashes in a row on
    the SAME query are needed to fail the fixture."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(str(out_dir), exist_ok=True)
    code = f"""
import os
import sys
sys.path.insert(0, {repo!r}); sys.path.insert(0, {repo + "/tests"!r})
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
import engine.queries_ext  # noqa: F401
from engine.queries import QUERIES
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
for name in {list(names)!r}:
    path = {str(out_dir)!r} + "/" + name + ".parquet"
    if os.path.exists(path):
        continue
    res = QUERIES[name]({sf_dir!r}, **{(kwargs or {})!r})
    if isinstance(res, pd.DataFrame):
        res = pa.Table.from_pandas(res, preserve_index=False)
    elif not isinstance(res, pa.Table):
        res = pa.Table.from_pandas(res.to_pandas())
    pq.write_table(res, path + ".tmp")
    os.replace(path + ".tmp", path)
ray.shutdown()
"""
    last = None
    for _ in range(attempts):
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=1800)
        last = r
        if r.returncode == 0:
            break
    assert last is not None and last.returncode == 0, (
        f"isolated batch failed after {attempts} attempts "
        f"(rc={last.returncode}):\nSTDOUT:{last.stdout[-1500:]}\n"
        f"STDERR:{last.stderr[-1500:]}")
    return {n: pq.read_table(f"{out_dir}/{n}.parquet") for n in names}


def run_query_isolated(name, sf_dir, out_path, kwargs=None, num_cpus=4):
    """Run QUERIES[name](sf_dir, **kwargs) in a SUBPROCESS with its own
    short-lived Ray session and read the result back from parquet.

    Used by the forced-hash-join tests (max_broadcast=0): Ray 2.49's
    join teardown can trip a driver-fatal RAY_CHECK
    (task_manager.cc:930, completion racing a cancel while the
    HashShuffleAggregator pool dies), which kills the whole pytest
    process with no report. Isolation turns that worst case into ONE
    visible test failure, and a fresh few-second session keeps the race
    window (which widens with driver-side task-spec accumulation and
    co-tenant load) minimal. Everything else still shares the
    session-scoped ray_session fixture."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = f"""
import sys
sys.path.insert(0, {repo!r}); sys.path.insert(0, {repo + "/tests"!r})
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
import engine.queries_ext  # noqa: F401
from engine.queries import QUERIES
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
res = QUERIES[{name!r}]({sf_dir!r}, **{(kwargs or {})!r})
if isinstance(res, pd.DataFrame):
    res = pa.Table.from_pandas(res, preserve_index=False)
elif not isinstance(res, pa.Table):
    res = pa.Table.from_pandas(res.to_pandas())
pq.write_table(res, {str(out_path)!r})
ray.shutdown()
"""
    r = None
    for _ in range(3):  # the teardown race is probabilistic — retry
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=900)
        if r.returncode == 0:
            break
    assert r is not None and r.returncode == 0, (
        f"isolated run of {name} failed (rc={r.returncode}):\n"
        f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return pq.read_table(str(out_path))
