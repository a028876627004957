"""Table sources: synthetic Common-Crawl-style pages + region dimension."""
