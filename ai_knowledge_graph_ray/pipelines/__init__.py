"""Phase composition + config."""
