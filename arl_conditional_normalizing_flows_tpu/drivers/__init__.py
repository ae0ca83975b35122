"""Command-line drivers — the equivalents of the reference's editable-header
scripts (TOYcINN.py, conv_cINN.py, conv_pre_training_cINN_on_noise.py,
create_tfrecords.py), but as proper CLIs with flags instead of
edit-the-source hyperparameter blocks (README.md:53)."""
