"""Sources: raw archive/TXT ingestion (bronze layer) and the throttled downloader."""
