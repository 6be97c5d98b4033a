"""Sources & sinks: synthetic-web generator, snapshot table manager."""
