"""Sources & sinks: table IO (Lance-or-parquet) and the synthetic site graph."""
