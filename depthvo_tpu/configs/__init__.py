"""Experiment configs — the rebuild's replacement for the reference's
``solver.prototxt`` + ``train.prototxt`` + ``train.sh`` triples
(SURVEY.md §5 "Config / flag system": plain dataclasses instead of
protobuf text, one constructor per staged experiment variant).
"""

from depthvo_tpu.configs.base import (  # noqa: F401
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    stereo,
    temporal_stereo,
    full_feat,
    tiny_test,
)
