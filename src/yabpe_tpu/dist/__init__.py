"""dist subpackage."""
