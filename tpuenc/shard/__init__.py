"""shard subpackage."""
