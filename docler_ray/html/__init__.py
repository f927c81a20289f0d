"""Pure-Python HTML parsing + main-content extraction + markdown serialization.

The local-extraction analog of the reference's markitdown converter
(/root/reference/src/docler/converters/markitdown_provider/provider.py:79-114),
built from scratch: stdlib-tokenizer DOM (no lxml/bs4 in this environment),
readability-style text-density / link-density scoring, deterministic markdown
serialization through the frozen marker grammar in docler_ray.markers.
"""

from docler_ray.html.extract import extract_html  # noqa: F401
