"""Scalar function families + Python UDF/UDAF/UDTF surface (SURVEY §2B)."""
