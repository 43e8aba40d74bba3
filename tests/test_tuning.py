"""DataContext tuning: reservation disabled only on small clusters."""


def test_configure_small_cluster_disables_reservation():
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

        # unknown cluster size (no ray): leaves the default alone
        configure_data_context(num_cpus=None)
        assert ctx.op_resource_reservation_enabled is True
    finally:
        ctx.op_resource_reservation_enabled = orig
