"""Dataset sources / synthesizers."""
