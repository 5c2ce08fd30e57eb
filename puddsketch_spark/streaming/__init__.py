from .sketch_stream import streaming_sketch, streaming_udds_quantiles, udds_state_update  # noqa: F401
