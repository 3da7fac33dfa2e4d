"""Host-side utilities: TOML writing, small-graph solvers, misc."""
