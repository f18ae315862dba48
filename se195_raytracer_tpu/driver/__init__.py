"""driver subpackage."""
