"""Tools: overlay rendering, analysis, validation harness."""
