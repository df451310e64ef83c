"""File-format sources and sinks (SURVEY §2B 'Scans / sources / sinks')."""
