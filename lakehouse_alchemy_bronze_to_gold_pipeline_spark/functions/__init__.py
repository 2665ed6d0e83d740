"""Column-function library — JVM-side compositions, no row-level Python."""
