"""State tables (snapshot-committed parquet) + the synthetic remote store
behind the fetch stage."""
