"""Event-time windowed operators (batch + Structured Streaming dual mount)."""
