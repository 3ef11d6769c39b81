"""Sources: replayable envelope inputs and the firehose connector."""
