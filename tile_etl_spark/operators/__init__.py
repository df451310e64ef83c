"""Relational operator builders (SURVEY §2B): scans, filters, joins,
aggregations, windows, sorts/top-k, set operations."""
