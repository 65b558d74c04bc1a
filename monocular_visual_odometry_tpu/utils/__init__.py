"""Host-side utilities: typed config, trajectory I/O, logging, profiling,
checkpoint/resume."""
