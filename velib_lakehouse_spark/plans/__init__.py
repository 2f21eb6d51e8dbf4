"""Plan inspection utilities: the scale contract made visible."""
