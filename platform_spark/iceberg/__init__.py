"""Pure-Python Apache Iceberg v2 table format (avro.py container files,
table.py metadata/manifests/commits/scans). See table.py for scope and
reference parity notes."""
