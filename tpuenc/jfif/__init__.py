"""jfif subpackage."""
