from arl_conditional_normalizing_flows_tpu.convert.reference_import import (  # noqa: F401
    import_conv_h5,
    import_toy_npy,
    parse_conv_filename,
    parse_toy_filename,
    read_keras_h5,
)
