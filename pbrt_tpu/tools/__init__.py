"""Command-line tools (the reference's src/pbrt/cmd/ equivalents)."""
