"""Column-function libraries (text analysis, net helpers)."""
