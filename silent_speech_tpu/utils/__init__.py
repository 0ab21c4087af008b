"""Host utilities: audio IO, run logging, profiling."""
