"""Sources: replication-stream emulation (file drop-dirs) and format readers."""
