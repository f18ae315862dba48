"""scenes subpackage."""
