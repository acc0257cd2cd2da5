"""Model shape/contract tests for the three networks (SURVEY.md §0)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from depthvo_tpu.models import DepthNet, FeatNet, OdomNet

H, W = 32, 96  # divisible by 32 (encoder stride) — tiny test shapes


class TestDepthNet:
    def test_multiscale_output_shapes(self):
        net = DepthNet(num_scales=4)
        x = jnp.zeros((2, H, W, 3))
        variables = net.init(jax.random.PRNGKey(0), x)
        disps = net.apply(variables, x)
        assert len(disps) == 4
        expected = [(2, H // 8, W // 8, 1), (2, H // 4, W // 4, 1),
                    (2, H // 2, W // 2, 1), (2, H, W, 1)]
        assert [d.shape for d in disps] == expected

    def test_disp_bounds(self):
        net = DepthNet(max_disp=0.3, min_disp=0.00625)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, H, W, 3)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        for d in net.apply(variables, x):
            assert float(d.min()) >= 0.00625
            assert float(d.max()) <= 0.30625
            assert d.dtype == jnp.float32

    def test_bfloat16_compute(self):
        net = DepthNet(compute_dtype=jnp.bfloat16)
        x = jnp.zeros((1, H, W, 3))
        variables = net.init(jax.random.PRNGKey(0), x)
        disps = net.apply(variables, x)
        assert disps[-1].dtype == jnp.float32  # heads return f32
        # params stay f32
        leaves = jax.tree.leaves(variables["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)

    def test_train_mode_updates_batch_stats(self):
        net = DepthNet()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, H, W, 3)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        _, mut = net.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mut["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
        )


class TestOdomNet:
    def test_output_shape_and_scale(self):
        net = OdomNet()
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, H, W, 6)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        twist = net.apply(variables, x)
        assert twist.shape == (3, 6)
        assert twist.dtype == jnp.float32
        # output_scale keeps the init near identity
        assert float(jnp.abs(twist).max()) < 0.5


class TestFeatNet:
    def test_normalized_dense_features(self):
        net = FeatNet(out_features=16)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, H, W, 3)), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x)
        f = net.apply(variables, x)
        assert f.shape == (2, H, W, 16)
        norms = np.linalg.norm(np.asarray(f), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    def test_fast_final_upsample_shapes(self):
        net = DepthNet(num_scales=4, fast_final_upsample=True)
        x = jnp.zeros((2, H, W, 3))
        variables = net.init(jax.random.PRNGKey(0), x)
        disps = net.apply(variables, x)
        expected = [(2, H // 8, W // 8, 1), (2, H // 4, W // 4, 1),
                    (2, H // 2, W // 2, 1), (2, H, W, 1)]
        assert [d.shape for d in disps] == expected
        # Finest scale is an upsample of the 1/2-res disp: same value range.
        assert float(disps[-1].min()) >= float(disps[-2].min()) - 1e-6
        assert float(disps[-1].max()) <= float(disps[-2].max()) + 1e-6


class TestSubpixelHead:
    def test_shapes_and_bounds(self):
        net = DepthNet(num_scales=4, subpixel_head=True)
        x = jnp.zeros((2, H, W, 3))
        variables = net.init(jax.random.PRNGKey(0), x)
        disps = net.apply(variables, x)
        expected = [(2, H // 8, W // 8, 1), (2, H // 4, W // 4, 1),
                    (2, H // 2, W // 2, 1), (2, H, W, 1)]
        assert [d.shape for d in disps] == expected
        for d in disps:
            assert float(d.min()) >= net.min_disp - 1e-6
            assert float(d.max()) <= net.max_disp + net.min_disp + 1e-6

    def test_depth_to_space_layout(self):
        """Each output 2x2 block comes from one 1/2-res pixel's 4 logits
        (channel c -> offset (c // 2, c % 2))."""
        import numpy as np

        net = DepthNet(num_scales=4, subpixel_head=True)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, H, W, 3)), jnp.float32
        )
        variables = net.init(jax.random.PRNGKey(1), x)
        disps = net.apply(variables, x)
        fine = np.asarray(disps[-1][0, :, :, 0])
        # Blocks are permutations of 4 independent predictions: the 4
        # phase-planes must not be identical (unlike bilinear upsample).
        phases = [fine[di::2, dj::2] for di in (0, 1) for dj in (0, 1)]
        assert any(
            not np.allclose(phases[0], p, atol=1e-7) for p in phases[1:]
        )

    def test_exclusive_with_fast_final_upsample(self):
        net = DepthNet(fast_final_upsample=True, subpixel_head=True)
        x = jnp.zeros((1, H, W, 3))
        with pytest.raises(ValueError, match="exclusive"):
            net.init(jax.random.PRNGKey(0), x)


class TestS2DFinest:
    """The space-to-depth finest stage is an EXACT program rewrite: same
    parameter tree, same function (mod float reassociation) — the
    conv-backward lever of benchmarks/conv_levers.py."""

    def test_param_tree_matches_standard(self):
        x = jnp.zeros((1, H, W, 3))
        std = DepthNet(num_scales=4).init(jax.random.PRNGKey(0), x)
        s2d = DepthNet(num_scales=4, s2d_finest=True).init(
            jax.random.PRNGKey(0), x
        )
        flat_std = jax.tree.map(jnp.shape, std["params"])
        flat_s2d = jax.tree.map(jnp.shape, s2d["params"])
        assert jax.tree.structure(flat_std) == jax.tree.structure(flat_s2d)
        assert jax.tree.leaves(flat_std) == jax.tree.leaves(flat_s2d)

    def test_forward_equivalent_to_standard(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, H, W, 3)), jnp.float32)
        std_net = DepthNet(num_scales=4)
        variables = std_net.init(jax.random.PRNGKey(7), x)
        ref = std_net.apply(variables, x)
        s2d_net = DepthNet(num_scales=4, s2d_finest=True)
        got = s2d_net.apply(variables, x)  # SAME params, rewritten program
        assert len(ref) == len(got)
        for r, g in zip(ref, got):
            assert r.shape == g.shape
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=2e-5,
                err_msg="s2d finest stage must compute the standard "
                        "stage's function",
            )

    def test_gradients_equivalent_to_standard(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(1, H, W, 3)), jnp.float32)
        std_net = DepthNet(num_scales=4)
        variables = std_net.init(jax.random.PRNGKey(9), x)

        def loss(params, net):
            out = net.apply({**variables, "params": params}, x)
            return sum(jnp.sum(d) for d in out)

        g_std = jax.grad(loss)(variables["params"], std_net)
        g_s2d = jax.grad(loss)(
            variables["params"], DepthNet(num_scales=4, s2d_finest=True)
        )
        for p_std, p_s2d in zip(
            jax.tree.leaves(g_std), jax.tree.leaves(g_s2d)
        ):
            np.testing.assert_allclose(
                np.asarray(p_s2d), np.asarray(p_std), rtol=2e-4, atol=2e-4
            )

    def test_exclusive_with_other_finest_modes(self):
        x = jnp.zeros((1, H, W, 3))
        with pytest.raises(ValueError, match="exclusive"):
            DepthNet(s2d_finest=True, subpixel_head=True).init(
                jax.random.PRNGKey(0), x
            )
        with pytest.raises(ValueError, match="quant"):
            DepthNet(s2d_finest=True, quant_mode="int8").init(
                jax.random.PRNGKey(0), x
            )


def test_depth_layer_order_and_table():
    """The caffe-time-analog per-layer table covers every top-level
    DepthNet boundary in execution order (profiling.depth_layer_order),
    and the prefix-timing harness produces a row per boundary."""
    from depthvo_tpu.utils.profiling import depth_layer_order, depth_layer_table

    order = depth_layer_order(num_scales=4)
    assert order[0] == "ConvBlock_0" and order[1:5] == [
        f"ResNetStage_{i}" for i in range(4)
    ]
    assert order[-1] == "Conv_3" and order.count("Conv_0") == 1
    assert len(order) == 1 + 4 + 5 * 2 + 4

    # Each boundary costs ~2 fresh CPU compiles; time a 4-boundary
    # prefix here (the full table is the TPU PERF.md artifact).
    subset = ["ConvBlock_0", "ResNetStage_0", "ResNetStage_1", "UpConv_0"]
    result = depth_layer_table(
        batch_size=1, height=32, width=96, steps=1, variant="tiny_test",
        layers=subset,
    )
    rows = result["rows"]
    assert [r["layer"] for r in rows] == subset
    # Forward AND Backward columns (caffe time prints both), all
    # non-negative by the monotone-cumulative projection.
    assert all(r["fwd_cumulative_ms"] > 0 for r in rows)
    assert all(r["forward_ms"] >= 0 for r in rows)
    assert all(r["backward_ms"] >= 0 for r in rows)
    assert all(r["bwd_cumulative_ms"] >= 0 for r in rows)
    # Backward through the whole net costs something.
    assert rows[-1]["bwd_cumulative_ms"] > 0


def test_odom_layer_table():
    """bench --mode odom_layers: the per-layer table generalizes to the
    odometry net (conv stack + FC head boundaries)."""
    from depthvo_tpu.utils.profiling import depth_layer_table, odom_layer_order

    order = odom_layer_order()
    assert order[0] == "ConvBlock_0" and order[-1] == "Dense_2"
    subset = ["ConvBlock_0", "ConvBlock_1", "Dense_2"]
    result = depth_layer_table(
        batch_size=1, height=32, width=96, steps=1, variant="tiny_test",
        layers=subset, net="odom",
    )
    assert result["mode"] == "odom_layers"
    rows = result["rows"]
    assert [r["layer"] for r in rows] == subset
    assert all(r["forward_ms"] >= 0 and r["backward_ms"] >= 0 for r in rows)
    assert rows[-1]["fwd_cumulative_ms"] > 0


def test_remat_preserves_forward_and_grads():
    """remat=True (jax.checkpoint over stages) is a pure memory/FLOPs
    trade: identical param tree, identical forward, matching grads."""
    import jax.numpy as jnp

    from depthvo_tpu.models.depth_net import DepthNet

    kw = dict(num_scales=2, compute_dtype=jnp.float32)
    net = DepthNet(**kw)
    net_r = DepthNet(remat=True, **kw)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 32, 96, 3)), jnp.float32
    )
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    # Same parameter structure: remat is a lifted transform, not a
    # different architecture — weights are interchangeable.
    vr = net_r.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(vr)

    def loss(mdl, v):
        return sum(jnp.sum(d) for d in mdl.apply(v, x, train=False))

    l0, g0 = jax.value_and_grad(lambda v: loss(net, v))(variables)
    l1, g1 = jax.value_and_grad(lambda v: loss(net_r, v))(variables)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_feat_layer_table():
    """bench --mode feat_layers: the per-layer table also covers the
    feature extractor (dilated conv blocks + projection conv)."""
    from depthvo_tpu.utils.profiling import depth_layer_table, feat_layer_order

    order = feat_layer_order()
    assert order == ["ConvBlock_0", "ConvBlock_1", "ConvBlock_2", "Conv_0"]
    subset = ["ConvBlock_0", "Conv_0"]
    result = depth_layer_table(
        batch_size=1, height=32, width=96, steps=1, variant="tiny_test",
        layers=subset, net="feat",
    )
    assert result["mode"] == "feat_layers"
    rows = result["rows"]
    assert [r["layer"] for r in rows] == subset
    assert all(r["forward_ms"] >= 0 and r["backward_ms"] >= 0 for r in rows)
    assert rows[-1]["fwd_cumulative_ms"] > 0
