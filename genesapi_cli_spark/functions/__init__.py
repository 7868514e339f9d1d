"""Scalar function surface + UDF/UDTF queries. Importing registers queries."""
