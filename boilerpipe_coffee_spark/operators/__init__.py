from .extract import extract, extract_staged, parse_blocks  # noqa: F401
