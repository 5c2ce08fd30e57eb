from .sketch_stream import (  # noqa: F401
    streaming_dedup,
    streaming_sketch,
    streaming_sketch_windowed,
    streaming_udds_quantiles,
    udds_state_update,
)
