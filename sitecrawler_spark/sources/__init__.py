"""External-format sources/sinks: sitemap XML seed ingestion, WARC
archive read/write."""
