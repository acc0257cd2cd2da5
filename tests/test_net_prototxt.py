"""NetParameter prototxt reader: parse, classify, map to native config.

Fixtures are written from the paper-level description of the three
Depth-VO-Feat networks (SURVEY.md §2a; no reference files exist on this
machine) and deliberately exercise both the modern `layer {}` and legacy
`input_dim:` / `layers {}` syntaxes plus TextFormat corner cases.
"""

import textwrap

import pytest

from depthvo_tpu.io.net_prototxt import (
    config_overrides,
    extract_facts,
    format_report,
    parse_prototxt,
)

DEPTH_DEPLOY = textwrap.dedent("""
    name: "depth_net_deploy"   # ResNet50-1by2 encoder-decoder
    input: "data"
    input_shape { dim: 1 dim: 3 dim: 160 dim: 608 }
    layer {
      name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
      convolution_param { num_output: 32 kernel_size: 7 stride: 2 pad: 3 }
    }
    layer { name: "bn_conv1" type: "BatchNorm" bottom: "conv1" top: "conv1" }
    layer { name: "scale_conv1" type: "Scale" bottom: "conv1" top: "conv1" }
    layer { name: "conv1_relu" type: "ReLU" bottom: "conv1" top: "conv1" }
    layer {
      name: "upconv5" type: "Deconvolution" bottom: "conv1" top: "upconv5"
      convolution_param { num_output: 16 kernel_size: 4 stride: 2 pad: 1 }
    }
    layer {
      name: "disp_pred" type: "Convolution" bottom: "upconv5" top: "disp"
      convolution_param { num_output: 1 kernel_size: 3 pad: 1 }
    }
""")

ODOM_DEPLOY = textwrap.dedent("""
    name: "odometry_net_deploy"
    input: "data"
    # legacy repeated input_dim form, two stacked RGB frames
    input_dim: 1
    input_dim: 6
    input_dim: 160
    input_dim: 608
    layer {
      name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
      convolution_param { num_output: 16 kernel_size: 7 stride: 2 }
    }
    layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
    layer {
      name: "fc_pose" type: "InnerProduct" bottom: "conv1" top: "se3"
      inner_product_param { num_output: 6 }
    }
""")

FEAT_DEPLOY = textwrap.dedent("""
    name: "feature_extractor"
    input: "data"
    input_shape { dim: 1 dim: 3 dim: 160 dim: 608 }
    layer {
      name: "feat_conv1" type: "Convolution" bottom: "data" top: "f1"
      convolution_param { num_output: 32 kernel_size: 3 pad: 1 }
    }
    layer { name: "feat_relu1" type: "ReLU" bottom: "f1" top: "f1" }
    layer {
      name: "feat_conv2" type: "Convolution" bottom: "f1" top: "f2"
      convolution_param { num_output: 16 kernel_size: 3 pad: 1 }
    }
""")

TRAIN_GRAPH = textwrap.dedent("""
    name: "depth_odometry_feat_train"
    layer {
      name: "data" type: "ImageData" top: "img_L" top: "img_R"
      include { phase: TRAIN }
      transform_param {
        scale: 1.0
        mean_value: 104.0
        mean_value: 117.0
        mean_value: 123.0
      }
      image_data_param {
        source: "train_list.txt" batch_size: 2
        new_height: 32 new_width: 96
      }
    }
    layer {
      name: "conv1" type: "Convolution" bottom: "img_L" top: "conv1"
      convolution_param { num_output: 32 kernel_size: 7 stride: 2 }
    }
    layer {
      name: "fc_pose" type: "InnerProduct" bottom: "conv1" top: "se3"
      inner_product_param { num_output: 6 }
    }
    layer { name: "SE3_generator" type: "Python" bottom: "se3" top: "T" }
    layer { name: "geo_transform" type: "Python" bottom: "T" top: "pts" }
    layer { name: "pinhole_proj" type: "Python" bottom: "pts" top: "uv" }
    layer {
      name: "inverse_warp" type: "Python" bottom: "img_R" bottom: "uv"
      top: "warped_L"
    }
    layer {
      name: "stereo_photo_loss" type: "L1Loss"
      bottom: "warped_L" bottom: "img_L" loss_weight: 1.0
    }
    layer {
      name: "temporal_photo_loss" type: "L1Loss"
      bottom: "warped_L" bottom: "img_L" loss_weight: 1.0
    }
    layer {
      name: "feat_recon_loss" type: "L1Loss"
      bottom: "warped_feat" bottom: "feat_L" loss_weight: 0.1
    }
    layer {
      name: "smooth_loss" type: "SmoothnessLoss"
      bottom: "disp" loss_weight: 0.05
    }
""")


def test_parser_nested_repeated_comments():
    msg = parse_prototxt(DEPTH_DEPLOY)
    assert msg["name"] == "depth_net_deploy"
    assert msg["input"] == "data"
    assert msg["input_shape"]["dim"] == [1, 3, 160, 608]
    layers = msg["layer"]
    assert len(layers) == 6
    assert layers[0]["convolution_param"]["num_output"] == 32


def test_parser_legacy_colon_brace_and_angle():
    msg = parse_prototxt(
        'a: { b: 1 } c < d: "x#y" > e: 2.5 f: TRAIN g: true'
    )
    assert msg["a"] == {"b": 1}
    assert msg["c"] == {"d": "x#y"}  # '#' inside quotes is not a comment
    assert msg["e"] == 2.5
    assert msg["f"] == "TRAIN"
    assert msg["g"] is True


def test_parser_rejects_malformed():
    with pytest.raises(ValueError):
        parse_prototxt("layer { name: 'x' ")  # unbalanced
    with pytest.raises(ValueError):
        parse_prototxt("key:")  # dangling


def test_depth_deploy_classification():
    f = extract_facts(parse_prototxt(DEPTH_DEPLOY))
    assert f.kind == "depth"
    assert (f.batch_size, f.channels, f.height, f.width) == (1, 3, 160, 608)
    assert f.has_decoder and not f.has_pose_head and not f.losses


def test_odom_deploy_classification_legacy_dims():
    f = extract_facts(parse_prototxt(ODOM_DEPLOY))
    assert f.kind == "odometry"
    assert f.channels == 6
    assert f.has_pose_head


def test_feature_deploy_classification():
    f = extract_facts(parse_prototxt(FEAT_DEPLOY))
    assert f.kind == "feature"
    assert not f.has_decoder and not f.has_pose_head


def test_train_graph_variant_and_overrides():
    f = extract_facts(parse_prototxt(TRAIN_GRAPH))
    assert f.kind == "train_graph"
    assert f.variant == "full_feat"  # feature-loss branch present
    assert f.batch_size == 2
    assert (f.height, f.width) == (32, 96)
    assert f.mean_values == (104.0, 117.0, 123.0)
    assert len(f.losses) == 4
    assert len(f.geometry_types) >= 3  # SE3 / transform / proj / warp

    over, notes = config_overrides(f)
    assert over["variant"] == "full_feat"
    assert over["batch_size"] == 2
    assert (over["height"], over["width"]) == (32, 96)
    assert over["stereo_weight"] == 1.0
    assert over["temporal_weight"] == 1.0
    assert over["feature_weight"] == 0.1
    assert over["smooth_weight"] == 0.05
    assert over["input_mean"] == [104.0, 117.0, 123.0]
    assert notes == []


def test_train_graph_without_feature_is_temporal_stereo():
    import re

    text = re.sub(r"layer \{[^{}]*feat_recon_loss[^{}]*\}", "", TRAIN_GRAPH)
    assert "feat_recon_loss" not in text
    f = extract_facts(parse_prototxt(text))
    assert f.variant == "temporal_stereo"


def test_stereo_only_graph():
    # no pose head, no feature branch -> stereo
    text = textwrap.dedent("""
        name: "stereo_train"
        layer {
          name: "data" type: "Data" top: "img"
          data_param { batch_size: 4 }
        }
        layer {
          name: "conv1" type: "Convolution" bottom: "img" top: "c1"
          convolution_param { num_output: 8 kernel_size: 3 }
        }
        layer {
          name: "stereo_loss" type: "L1Loss" bottom: "c1" loss_weight: 1.0
        }
    """)
    f = extract_facts(parse_prototxt(text))
    assert f.variant == "stereo"
    assert f.batch_size == 4


def test_disagreeing_multiscale_weights_noted_not_applied():
    text = textwrap.dedent("""
        name: "n"
        layer { name: "smooth_loss_s0" type: "L1Loss" bottom: "d0"
                loss_weight: 0.05 }
        layer { name: "smooth_loss_s1" type: "L1Loss" bottom: "d1"
                loss_weight: 0.025 }
    """)
    f = extract_facts(parse_prototxt(text))
    over, notes = config_overrides(f)
    assert "smooth_weight" not in over
    assert any("smooth_weight" in n for n in notes)


def test_agreeing_multiscale_weights_applied():
    text = textwrap.dedent("""
        name: "n"
        layer { name: "smooth_loss_s0" type: "L1Loss" bottom: "d0"
                loss_weight: 0.05 }
        layer { name: "smooth_loss_s1" type: "L1Loss" bottom: "d1"
                loss_weight: 0.05 }
    """)
    f = extract_facts(parse_prototxt(text))
    over, _ = config_overrides(f)
    assert over["smooth_weight"] == 0.05


def test_zero_weight_losses_do_not_make_train_graph():
    # deploy graphs sometimes keep a loss with loss_weight: 0 for logging
    text = textwrap.dedent("""
        name: "n"
        input: "data"
        input_shape { dim: 1 dim: 6 dim: 160 dim: 608 }
        layer { name: "fc_pose" type: "InnerProduct" bottom: "data" top: "p"
                inner_product_param { num_output: 6 } }
        layer { name: "aux_loss" type: "L1Loss" bottom: "p" loss_weight: 0.0 }
    """)
    f = extract_facts(parse_prototxt(text))
    assert f.kind == "odometry"


def test_format_report_mentions_everything():
    f = extract_facts(parse_prototxt(TRAIN_GRAPH))
    over, _ = config_overrides(f)
    rep = format_report(f, over)
    assert "full_feat" in rep
    assert "mean=[104.0, 117.0, 123.0]" in rep
    assert "smooth_loss" in rep


def test_cli_net_info(tmp_path, capsys):
    from depthvo_tpu import cli

    f = tmp_path / "deploy.prototxt"
    f.write_text(DEPTH_DEPLOY)
    out_json = tmp_path / "facts.json"
    rc = cli.main(["net-info", str(f), "--json", str(out_json)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "kind=depth" in text
    import json as _json

    blob = _json.loads(out_json.read_text())
    assert blob["kind"] == "depth"
    assert blob["overrides"]["height"] == 160

    bad = tmp_path / "bad.prototxt"
    bad.write_text('name: "x"')  # nothing recognizable
    assert cli.main(["net-info", str(bad)]) == 1


def test_cli_train_weights_with_solver_net_folds_mean(tmp_path, capsys):
    """train --solver (net: with transform_param) + --weights: the
    recognized mean/scale folds into the seated input conv, and training
    runs — the `caffe train --solver= --weights=` composition."""
    import dataclasses

    import jax
    import numpy as np

    from depthvo_tpu import cli
    from depthvo_tpu.configs import stereo
    from depthvo_tpu.io.export_weights import export_caffemodel
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
    """)
    (tmp_path / "solver.prototxt").write_text(
        'net: "train.prototxt"\nbase_lr: 0.001\nmax_iter: 10\n'
    )
    cfg = stereo(batch_size=2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, height=32, width=96)
    )
    src = create_state(cfg, jax.random.PRNGKey(2))
    export_caffemodel(
        src.params["depth"], batch_stats=src.batch_stats,
        path=str(tmp_path / "d.caffemodel"),
    )
    rc = cli.main([
        "train", "--solver", str(tmp_path / "solver.prototxt"),
        "--weights", str(tmp_path / "d.caffemodel"),
        "--steps", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "folding transform_param mean=[104.0, 117.0, 123.0]" in out
    assert "step 0:" in out and "loss/stereo" in out
