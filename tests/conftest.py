import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        # 8 cpus: the distributed-diff tests run many small hash-
        # shuffle joins whose aggregator actors (0.25 CPU each) starve
        # behind map tasks at 4 cpus (measured 2-3x slowdown)
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session", autouse=True)
def quiet_ray_data():
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass
    yield


REF_RESOURCES = "/root/reference/tests/resources"
