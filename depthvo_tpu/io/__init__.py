"""IO subsystem: checkpointing and legacy weight import.

* ``checkpoint``       — orbax save/restore of {params, batch_stats,
  opt_state, step}; the rebuild of Caffe's ``Solver::Snapshot`` /
  ``--snapshot`` resume / ``--weights`` staged-finetune init
  (SURVEY.md §5 "Checkpoint / resume").
* ``caffemodel``       — ``.caffemodel`` wire-format parser AND encoder
  (no Caffe/protoc dependency) for the fidelity gate (SURVEY.md §2b(ii):
  the caffe.proto schema's role), with OIHW→HWIO / BGR / BN+Scale
  conversion helpers.
* ``import_weights``   — places parsed layers into flax trees: by
  explicit ``name_map`` (strict report) or shape-order; folds the data
  layer's mean/scale into the input conv (``fold_input_transform``);
  ``import_net`` chains it all (CLI: ``import-caffemodel``).
* ``export_weights``   — writes model-zoo ``.caffemodel`` files back
  (CLI: ``export-caffemodel``); round-trip exact against the importer.
* ``solver_prototxt``  — runs reference ``solver.prototxt`` files
  unchanged (all six solver types, seven lr policies; CLI:
  ``train --solver``).
* ``net_prototxt``     — NetParameter TextFormat parser + recognizer:
  which of the three nets a prototxt describes, input dims,
  preprocessing, loss weights (CLI: ``net-info``; consumed by
  ``train --solver`` net: and ``convert``). Facts only — never executed.
* ``name_map``         — derives the ``{caffe_layer -> flax path}`` map
  for name-based import from the weights file itself, with an
  order-trusted audit report (CLI: ``make-name-map``, ``convert``).
* ``serving``          — weights-embedded StableHLO deploy artifact
  (CLI: ``export-serving``).
"""
