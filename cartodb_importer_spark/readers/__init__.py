"""Format readers (SURVEY §2 O3-O8, O14-O15): each module turns one input
format into a (DataFrame, metadata) pair. The router dispatches on extension
and handles archive explosion, mirroring importer.rb:98-190."""
