from .binary_doubles import read_binary_doubles  # noqa: F401
from .transcripts import TRANSCRIPT_SCHEMA, read_transcripts, validate_transcript_schema  # noqa: F401
