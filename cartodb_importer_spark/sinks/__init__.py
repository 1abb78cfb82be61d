"""Sinks: the staged-atomic-publish table protocol (O15/O17/O20) over a
pluggable catalog (JDBC/Postgres for production parity with the reference,
local parquet warehouse for hermetic tests), plus file export sinks
(O28-O31)."""
