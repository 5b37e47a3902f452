"""engine — a Ray-Data-native data-quality / quality-filter engine.

A from-scratch reimplementation of the query and data-processing
capabilities of jiminnote/data-quality-framework (reference at
/root/reference), re-expressed Ray-Data-first:

- every per-record operator is a vectorized ``map_batches`` transform over
  zero-copy Arrow batches (`batch_format="pyarrow"`);
- stateful stages (langid model, n-gram LM, compiled regex banks) are
  actor-pool ``map_batches`` stages with setup in ``__init__``;
- wide operations (dedup, grouped rollups) are explicit
  ``groupby``/aggregate shuffles with documented keys and skew handling;
- check results are CheckResult-shaped audit rows
  (reference: src/checker/base_checker.py:26-69) built from Ray Data
  aggregates, never driver-side row loops.

Nothing here calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (keep `import engine` free of Ray imports)."""
    if name == "quality_pipeline":
        from .pipelines.quality import quality_pipeline

        return quality_pipeline
    if name == "run_validation":
        from .validate import run_validation

        return run_validation
    if name == "run_checkpointed":
        from .checkpoint import run_checkpointed

        return run_checkpointed
    if name == "CheckResult":
        from .audit import CheckResult

        return CheckResult
    raise AttributeError(name)
