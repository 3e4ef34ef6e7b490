"""Sources and sinks: WET ingest, text/packed/binary outputs (S1-S10)."""
