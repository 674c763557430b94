"""Frame sources and sinks (host side)."""
