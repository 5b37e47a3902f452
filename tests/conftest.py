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
