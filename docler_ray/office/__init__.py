"""Office/OOXML extraction (docx / pptx / xlsx) — pure stdlib zip+XML."""
