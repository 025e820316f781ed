import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (local mode, 4 CPUs)."""
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = None
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield ray
    ray.shutdown()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running gate-budget sweeps")
