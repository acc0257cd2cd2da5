"""Caffe solver.prototxt reader (io/solver_prototxt.py): the
`caffe train --solver=` migration path. Fixture mirrors the fields a
Depth-VO-Feat-era solver file carries (SURVEY §2a solver configs row)."""

import pytest

from depthvo_tpu.configs import base as configs
from depthvo_tpu.io.solver_prototxt import (
    apply_solver_prototxt,
    parse_solver_prototxt,
)

REALISTIC = """\
# Depth-VO-Feat-style solver
net: "experiments/depth_odometry/train.prototxt"
base_lr: 0.001
lr_policy: "step"
gamma: 0.5
stepsize: 80000
max_iter: 200000
momentum: 0.9
momentum2: 0.999
type: "Adam"
weight_decay: 0.0005
iter_size: 2
display: 50
snapshot: 5000
snapshot_prefix: "snapshots/depth_odometry"
test_interval: 2000
test_iter: 20
solver_mode: GPU
device_id: 0
"""


class TestParse:
    def test_realistic_fields(self):
        d = parse_solver_prototxt(REALISTIC)
        assert d["base_lr"] == 0.001
        assert d["lr_policy"] == "step"
        assert d["type"] == "Adam"
        assert d["solver_mode"] == "GPU"  # bare enum token
        assert d["net"] == "experiments/depth_odometry/train.prototxt"
        assert d["iter_size"] == 2

    def test_repeated_stepvalue(self):
        d = parse_solver_prototxt(
            'lr_policy: "multistep"\nstepvalue: 100\nstepvalue: 300\n'
        )
        assert d["stepvalue"] == [100, 300]

    def test_comments_and_blank_lines(self):
        d = parse_solver_prototxt(
            "# header\n\nbase_lr: 0.01  # inline comment\n"
        )
        assert d == {"base_lr": 0.01}

    def test_bool_and_old_style_enum(self):
        d = parse_solver_prototxt(
            "debug_info: true\nsolver_type: ADAM\n"
        )
        assert d["debug_info"] is True
        assert d["solver_type"] == "ADAM"

    def test_nested_message_rejected(self):
        with pytest.raises(ValueError, match="cannot parse"):
            parse_solver_prototxt("train_state {\n}\n")


class TestApply:
    def test_realistic_overlay(self):
        cfg, extras = apply_solver_prototxt(REALISTIC, configs.full_feat())
        o = cfg.optim
        assert o.learning_rate == 0.001
        assert o.lr_policy == "step"
        assert o.lr_decay_factor == 0.5
        assert o.lr_decay_steps == 80000
        assert o.total_steps == 200000
        assert o.beta1 == 0.9 and o.beta2 == 0.999
        assert o.optimizer == "adam"
        assert o.weight_decay == 0.0005
        assert o.iter_size == 2
        assert o.warmup_steps == 0  # Caffe has no warmup
        assert cfg.checkpoint_every == 5000
        assert cfg.log_every == 50
        assert extras["eval_every"] == 2000
        assert extras["eval_steps"] == 20
        # deploy-only fields surfaced, not fatal
        assert set(extras["ignored"]) == {
            "net", "snapshot_prefix", "solver_mode", "device_id"
        }
        # the loss graph/model come from the base config, untouched
        assert cfg.use_feature and cfg.use_temporal

    def test_multistep_solver(self):
        text = (
            'type: "Nesterov"\nbase_lr: 0.01\nmomentum: 0.95\n'
            'lr_policy: "multistep"\ngamma: 0.1\n'
            "stepvalue: 60000\nstepvalue: 90000\n"
        )
        cfg, _ = apply_solver_prototxt(text, configs.stereo())
        assert cfg.optim.optimizer == "nesterov"
        assert cfg.optim.lr_step_values == (60000, 90000)
        assert cfg.optim.beta1 == 0.95

    def test_old_style_solver_type(self):
        cfg, _ = apply_solver_prototxt(
            "solver_type: RMSPROP\nrms_decay: 0.98\n", configs.stereo()
        )
        assert cfg.optim.optimizer == "rmsprop"
        assert cfg.optim.rms_decay == 0.98

    def test_unsupported_type_raises(self):
        with pytest.raises(ValueError, match="unsupported solver type"):
            apply_solver_prototxt('type: "LBFGS"\n', configs.stereo())

    def test_unset_fields_keep_base(self):
        base = configs.stereo(
            optim=configs.OptimConfig(grad_clip_norm=5.0)
        )
        cfg, _ = apply_solver_prototxt("base_lr: 0.02\n", base)
        assert cfg.optim.grad_clip_norm == 5.0
        assert cfg.optim.learning_rate == 0.02

    def test_roundtrips_through_make_optimizer(self):
        """The overlaid config builds a working optimizer chain."""
        import jax.numpy as jnp
        import optax

        from depthvo_tpu.train.state import make_optimizer

        cfg, _ = apply_solver_prototxt(REALISTIC, configs.stereo())
        tx = make_optimizer(cfg)
        params = {"depth": {"w": jnp.ones(2)}, "odom": {}, "feat": {}}
        st = tx.init(params)
        g = {"depth": {"w": jnp.ones(2)}, "odom": {}, "feat": {}}
        # iter_size 2: first micro-batch accumulates (no param move),
        # second applies the update — Caffe's accumulation semantics.
        up1, st = tx.update(g, st, params)
        assert float(jnp.max(jnp.abs(up1["depth"]["w"]))) == 0.0
        up2, st = tx.update(g, st, params)
        assert float(jnp.max(jnp.abs(up2["depth"]["w"]))) > 0.0
