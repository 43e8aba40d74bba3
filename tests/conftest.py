import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from logjuicer_ray.tuning import configure_data_context

    configure_data_context()
    yield
    ray.shutdown()
