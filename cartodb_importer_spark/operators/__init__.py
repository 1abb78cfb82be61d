"""Engine operator library — thin, named, documented wrappers over the Spark
DataFrame API (SURVEY §2.3), plus the few operators Spark lacks natively
(as-of join). Wrappers are deliberately thin: the value is the declared,
tested surface, not abstraction."""
