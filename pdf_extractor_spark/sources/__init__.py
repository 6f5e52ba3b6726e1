"""Sources: synthetic Common-Crawl-style pages + parquet readers."""
