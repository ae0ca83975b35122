from arl_conditional_normalizing_flows_tpu.utils.profiling import (  # noqa: F401
    annotate,
    profile_trace,
    step_timer,
)
from arl_conditional_normalizing_flows_tpu.utils.roofline import (  # noqa: F401
    device_peaks,
    parse_hlo_convs,
    roofline_from_statics,
    roofline_report,
    roofline_statics,
)
from arl_conditional_normalizing_flows_tpu.utils.run_metadata import (  # noqa: F401
    write_run_metadata,
)
