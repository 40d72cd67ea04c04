"""``Dataset -> Dataset`` pipeline stages."""
