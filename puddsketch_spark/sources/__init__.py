from .transcripts import TRANSCRIPT_SCHEMA, read_transcripts, validate_transcript_schema  # noqa: F401
