"""DataContext tuning: reservation disabled only on small clusters."""


def test_configure_small_cluster_disables_reservation(monkeypatch):
    import ray
    from ray.data import DataContext

    from logjuicer_ray.tuning import configure_data_context

    ctx = DataContext.get_current()
    orig = ctx.op_resource_reservation_enabled
    try:
        ctx.op_resource_reservation_enabled = True
        configure_data_context(num_cpus=8)
        assert ctx.op_resource_reservation_enabled is False

        ctx.op_resource_reservation_enabled = True
        configure_data_context(num_cpus=32)
        assert ctx.op_resource_reservation_enabled is True

        # unknown cluster size (no live ray — stubbed, because the pytest
        # session keeps a shared Ray running): leaves the default alone
        monkeypatch.setattr(ray, "is_initialized", lambda: False)
        configure_data_context(num_cpus=None)
        assert ctx.op_resource_reservation_enabled is True
    finally:
        ctx.op_resource_reservation_enabled = orig
