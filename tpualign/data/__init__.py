"""Host-side data layer: document processing, chunking, captions, lexical
vocabulary, operator filtering, and the batched device input feed.

This is the TPU rebuild of the reference's document-extraction layer
(ref:src/pdf_processor.py) and lexical filter
(ref:src/filter_lexical_components.py). Document parsing stays host work
(the input-feed frontier, SURVEY.md §2.2); everything from pixels/tokens on
runs on device.

PDF libraries are optional: the ``MuPDFBackend`` activates when
PyMuPDF/pdfplumber are installed; the ``SyntheticBackend`` reads
deterministic ``*.synthdoc.json`` fixtures (this replaces the reference's
reportlab-generated test PDFs in environments without PDF tooling).
"""

from tpualign.data.processor import DocumentProcessor  # noqa: F401
from tpualign.data.backends import (  # noqa: F401
    DocumentHandle,
    RasterImage,
    Word,
    SyntheticBackend,
    open_document,
)
from tpualign.data.filtering import filter_lexical_components  # noqa: F401
from tpualign.data.lexical import (  # noqa: F401
    extract_lexical_components,
    preprocess_text,
)
