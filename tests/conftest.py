import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus(tmp_path_factory):
    """Deterministic smoke corpus (FIXTURES.md sizes: H=20, ~1k pages)."""
    from raycrawl.fixtures.gen_corpus import generate

    out = str(tmp_path_factory.mktemp("corpus") / "smoke")
    generate(out, n_hosts=20, n_pages=1000, seed=42)
    return out


# override with RAYCRAWL_SF_DIR=/root/testdata/sf0.01 to mirror the
# driver's correctness scale (CLAUDE.md: keep green at BOTH)
SF_DIR = os.environ.get("RAYCRAWL_SF_DIR", "/root/testdata/sf0.001")
