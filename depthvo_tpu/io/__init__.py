"""IO subsystem: checkpointing and legacy weight import.

* ``checkpoint``       — orbax save/restore of {params, batch_stats,
  opt_state, step}; the rebuild of Caffe's ``Solver::Snapshot`` /
  ``--snapshot`` resume / ``--weights`` staged-finetune init
  (SURVEY.md §5 "Checkpoint / resume").
* ``caffemodel``       — one-way importer for released ``.caffemodel``
  files (protobuf wire-format parser, no Caffe/protoc dependency) for the
  fidelity gate (SURVEY.md §2b(ii): the caffe.proto schema's role).
"""
