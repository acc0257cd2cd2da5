"""Auto-generated name maps (io/name_map.py): the audited path from a
released `.caffemodel` to a trustworthy name-based import."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from depthvo_tpu.io import caffemodel, import_weights, name_map
from depthvo_tpu.io.export_weights import export_caffemodel
from depthvo_tpu.io.net_prototxt import extract_facts, parse_prototxt


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def encode_net(entries) -> bytes:
    return caffemodel.write_caffemodel(
        [(n, t, bl) for n, t, bl in entries], path=None
    )


class SmallNet(nn.Module):
    """One unique-shape conv + two same-shape twins."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        return x


def _small_layers(rng, order):
    w1 = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    w2a = rng.normal(size=(8, 8, 3, 3)).astype(np.float32)
    w2b = rng.normal(size=(8, 8, 3, 3)).astype(np.float32)
    blobs = {"conv1": w1, "res2a_branch2a": w2a, "res2a_branch2b": w2b}
    raw = encode_net([(n, "Convolution", [blobs[n]]) for n in order])
    return caffemodel.parse_caffemodel(raw)


class TestGenerate:
    def _params(self, rng):
        model = SmallNet()
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
        return model.init(jax.random.PRNGKey(0), x)["params"]

    def test_unique_shapes_mapped_regardless_of_file_order(self, rng):
        params = self._params(rng)
        # conv1 (unique 3-in shape) LAST in the file: shape classes make
        # its placement order-independent.
        layers = _small_layers(
            rng, ["res2a_branch2a", "res2a_branch2b", "conv1"]
        )
        m, entries, problems = name_map.generate_name_map(layers, params)
        assert problems == []
        assert m["convs"]["conv1"] == "Conv_0"
        e1 = next(e for e in entries if e.caffe_layer == "conv1")
        assert not e1.order_trusted  # unique shape class

    def test_twins_flagged_order_trusted(self, rng):
        params = self._params(rng)
        layers = _small_layers(
            rng, ["conv1", "res2a_branch2a", "res2a_branch2b"]
        )
        m, entries, _ = name_map.generate_name_map(layers, params)
        twins = [e for e in entries if e.caffe_layer.startswith("res2a")]
        assert len(twins) == 2
        assert all(e.order_trusted and e.class_size == 2 for e in twins)
        # In-class pairing follows relative order: 2a -> Conv_1, 2b -> Conv_2.
        assert m["convs"]["res2a_branch2a"] == "Conv_1"
        assert m["convs"]["res2a_branch2b"] == "Conv_2"
        rep = name_map.format_map_report(entries, [])
        assert "order-trusted" in rep and "[unique]" in rep

    def test_count_mismatch_strict_raises_lenient_reports(self, rng):
        params = self._params(rng)
        layers = _small_layers(rng, ["conv1", "res2a_branch2a"])  # one short
        with pytest.raises(ValueError, match="no imported layer"):
            name_map.generate_name_map(layers, params, strict=True)
        _, _, problems = name_map.generate_name_map(
            layers, params, strict=False
        )
        assert any("Conv_" in p for p in problems)

    def test_extra_source_layer_reported(self, rng):
        params = self._params(rng)
        w_extra = rng.normal(size=(4, 8, 1, 1)).astype(np.float32)
        layers = _small_layers(
            rng, ["conv1", "res2a_branch2a", "res2a_branch2b"]
        )
        raw = encode_net(
            [(n, "Convolution", [l["blobs"][0]]) for n, l in layers.items()]
            + [("orphan", "Convolution", [w_extra])]
        )
        layers2 = caffemodel.parse_caffemodel(raw)
        with pytest.raises(ValueError, match="orphan"):
            name_map.generate_name_map(layers2, params, strict=True)


class TestProtoCrossCheck:
    PROTO_OK = """
        name: "n"
        layer { name: "conv1" type: "Convolution" bottom: "d" top: "c1"
                convolution_param { num_output: 8 kernel_size: 3 } }
        layer { name: "res2a_branch2a" type: "Convolution" bottom: "c1"
                top: "c2" convolution_param { num_output: 8 kernel_size: 3 } }
        layer { name: "res2a_branch2b" type: "Convolution" bottom: "c2"
                top: "c3" convolution_param { num_output: 8 kernel_size: 3 } }
    """

    def test_agreeing_proto_passes(self, rng):
        model = SmallNet()
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        layers = _small_layers(
            rng, ["conv1", "res2a_branch2a", "res2a_branch2b"]
        )
        facts = extract_facts(parse_prototxt(self.PROTO_OK))
        assert [n for n, _ in facts.learnable_layers] == [
            "conv1", "res2a_branch2a", "res2a_branch2b"
        ]
        _, _, problems = name_map.generate_name_map(
            layers, params, proto_facts=facts, strict=True
        )
        assert problems == []

    def test_num_output_mismatch_raises(self, rng):
        model = SmallNet()
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        layers = _small_layers(
            rng, ["conv1", "res2a_branch2a", "res2a_branch2b"]
        )
        facts = extract_facts(
            parse_prototxt(self.PROTO_OK.replace(
                'name: "conv1" type: "Convolution" bottom: "d" top: "c1"\n'
                "                convolution_param { num_output: 8",
                'name: "conv1" type: "Convolution" bottom: "d" top: "c1"\n'
                "                convolution_param { num_output: 16",
            ))
        )
        assert ("conv1", 16) in facts.learnable_layers
        with pytest.raises(ValueError, match="num_output=16"):
            name_map.generate_name_map(
                layers, params, proto_facts=facts, strict=True
            )

    def test_missing_layer_in_weights_reported_not_fatal(self, rng):
        # A declared layer absent from the weights file is REPORTED but
        # does not fail strict mode: the documented companion may be the
        # full siamese train graph, which declares other nets' towers.
        model = SmallNet()
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        layers = _small_layers(rng, ["res2a_branch2a", "res2a_branch2b",
                                     "conv1"])
        proto = self.PROTO_OK + """
        layer { name: "conv_ghost" type: "Convolution" bottom: "c3"
                top: "c4" convolution_param { num_output: 8 } }
        """
        facts = extract_facts(parse_prototxt(proto))
        m, _, problems = name_map.generate_name_map(
            layers, params, proto_facts=facts, strict=True
        )
        assert any("conv_ghost" in p for p in problems)
        assert len(m["convs"]) == 3  # the real layers still mapped

    def test_deconv_axes_swapped(self, rng):
        # Caffe Deconvolution blobs are (C_in, C_out/g, kh, kw): both the
        # signature and the num_output cross-check must read the swapped
        # axes (a real released decoder may be deconv-based).
        w = rng.normal(size=(16, 4, 2, 2)).astype(np.float32)  # in=16 out=4
        raw = encode_net([("upconv", "Deconvolution", [w])])
        layers = caffemodel.parse_caffemodel(raw)
        assert name_map._caffe_kernel_shape(layers["upconv"]) == (2, 2, 16, 4)
        assert name_map._caffe_out_channels(layers["upconv"]) == 4
        facts = extract_facts(parse_prototxt("""
            layer { name: "upconv" type: "Deconvolution" bottom: "x"
                    top: "y" convolution_param { num_output: 4 } }
        """))
        # num_output=4 agrees with the swapped axis: no mismatch raised.
        probs = name_map._check_against_proto(layers, facts, strict=True)
        assert probs == []


class TestFullDepthNetRoundTrip:
    """Generate a map from this repo's own exporter output for the real
    depth net (ResNet50-1/2 + decoder, full of identically-shaped
    kernels), then import strictly BY NAME with the generated maps and
    require exact forward parity — the end-to-end flow released weights
    will take."""

    def test_generated_map_imports_exactly(self):
        from depthvo_tpu.configs import tiny_test
        from depthvo_tpu.train.state import create_state

        cfg = tiny_test()
        state = create_state(cfg, jax.random.PRNGKey(3))
        raw = export_caffemodel(
            state.params["depth"], batch_stats=state.batch_stats, path=None
        )
        layers = caffemodel.parse_caffemodel(raw)

        fresh = create_state(cfg, jax.random.PRNGKey(99))
        m, entries, problems = name_map.generate_name_map(
            layers, fresh.params["depth"], fresh.batch_stats, strict=True
        )
        assert problems == []
        n_kernels = len([
            1 for p, l in import_weights._flatten_with_path(
                fresh.params["depth"])
            if p[-1] == "kernel"
        ])
        assert len(m["convs"]) == n_kernels
        assert len(m["bns"]) > 0

        got_params, got_stats, report = import_weights.import_net(
            layers, fresh.params["depth"], fresh.batch_stats,
            name_map=m["convs"], bn_name_map=m["bns"], strict=True,
        )
        assert all(v["via"] == "name" for v in report.values())
        for (pa, a), (pb, b) in zip(
            import_weights._flatten_with_path(state.params["depth"]),
            import_weights._flatten_with_path(got_params),
        ):
            assert pa == pb
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6, err_msg=pa)


def test_cli_make_name_map(tmp_path, capsys):
    """CLI surface: write the JSON import-caffemodel --name-map eats."""
    from depthvo_tpu import cli
    from depthvo_tpu.configs import tiny_test
    from depthvo_tpu.train.state import create_state

    cfg = tiny_test()
    state = create_state(cfg, jax.random.PRNGKey(3))
    model_path = tmp_path / "m.caffemodel"
    export_caffemodel(
        state.params["depth"], batch_stats=state.batch_stats,
        path=str(model_path),
    )
    out = tmp_path / "map.json"
    rc = cli.main([
        "make-name-map", "--caffemodel", str(model_path),
        "--variant", "tiny_test", "--net", "depth",
        "--output", str(out),
    ])
    assert rc == 0
    m = json.loads(out.read_text())
    assert set(m) == {"convs", "bns"} and m["convs"]
    text = capsys.readouterr().out
    assert "order-trusted" in text


def test_cli_convert_end_to_end(tmp_path, capsys):
    """`depthvo convert`: solver+net prototxt + caffemodel -> experiment
    dir whose checkpoint carries the seated weights and whose config
    reflects both files (the one-shot migration path)."""
    import dataclasses

    from depthvo_tpu import cli
    from depthvo_tpu.configs import base as config_io, stereo
    from depthvo_tpu.train.state import create_state

    (tmp_path / "train.prototxt").write_text("""
        name: "stereo_train"
        layer {
          name: "data" type: "ImageData" top: "L" top: "R"
          transform_param { mean_value: 104.0 mean_value: 117.0
                            mean_value: 123.0 }
          image_data_param { source: "x.txt" batch_size: 2
                             new_height: 32 new_width: 96 }
        }
        layer { name: "conv1" type: "Convolution" bottom: "L" top: "c"
                convolution_param { num_output: 32 kernel_size: 7 } }
        layer { name: "stereo_loss" type: "L1Loss" bottom: "c"
                loss_weight: 1.0 }
        layer { name: "smooth_loss" type: "L1Loss" bottom: "c"
                loss_weight: 0.2 }
    """)
    (tmp_path / "solver.prototxt").write_text(
        'net: "train.prototxt"\nbase_lr: 0.002\ntype: "Nesterov"\n'
        "momentum: 0.95\nlr_policy: \"fixed\"\nmax_iter: 50\n"
    )
    cfg_src = stereo(batch_size=2)
    cfg_src = dataclasses.replace(
        cfg_src, model=dataclasses.replace(
            cfg_src.model, height=32, width=96
        )
    )
    src = create_state(cfg_src, jax.random.PRNGKey(11))
    export_caffemodel(
        src.params["depth"], batch_stats=src.batch_stats,
        path=str(tmp_path / "depth.caffemodel"),
    )
    out = tmp_path / "exp"
    rc = cli.main([
        "convert", "--solver", str(tmp_path / "solver.prototxt"),
        "--weights", str(tmp_path / "depth.caffemodel"),
        "--output-dir", str(out),
    ])
    assert rc == 0
    cfg = config_io.load_json(str(out / "config.json"))
    assert cfg.name == "stereo"
    assert cfg.batch_size == 2
    assert (cfg.model.height, cfg.model.width) == (32, 96)
    assert cfg.optim.optimizer == "nesterov"
    assert cfg.optim.learning_rate == 0.002
    assert cfg.smooth_weight == 0.2
    assert (out / "name_map_depth.json").is_file()

    from depthvo_tpu import api

    m = api.DepthVO.from_checkpoint(str(out / "checkpoint"))
    a = np.asarray(
        src.params["depth"]["ResNetStage_0"]["Bottleneck_0"]["ConvBlock_0"]
        ["Conv_0"]["kernel"]
    )
    b = np.asarray(
        m.params["depth"]["ResNetStage_0"]["Bottleneck_0"]["ConvBlock_0"]
        ["Conv_0"]["kernel"]
    )
    np.testing.assert_array_equal(a, b)  # interior conv seated bit-exact
    # Input conv folded by transform_param (scale*127.5 with scale=1).
    ai = np.asarray(src.params["depth"]["ConvBlock_0"]["Conv_0"]["kernel"])
    bi = np.asarray(m.params["depth"]["ConvBlock_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(bi / ai, 127.5, rtol=1e-5)
