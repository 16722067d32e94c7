"""Sources: synthetic corpus generators and Parquet table readers."""
