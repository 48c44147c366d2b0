"""Fixed-layout CP932 parse layer (bronze lines -> silver tables)."""
