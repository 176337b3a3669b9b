"""Structured Streaming ports (SURVEY §2.11 ★[EXT]): the reference's
planned event-driven batch (aws_etl.drawio:57-61) expressed as
file-source streams with Trigger.AvailableNow."""
