"""Native (C++) runtime components with pure-Python fallbacks."""
