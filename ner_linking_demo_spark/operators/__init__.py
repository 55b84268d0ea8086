"""DataFrame -> DataFrame pipeline stages."""
