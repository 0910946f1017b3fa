"""Extractor chains (``source/Boilerpipe.coffee:29-103``) and the
single-document entry point ``document_from_html`` -- the pure-Python
core the Spark engine batches over Arrow.
"""

from __future__ import annotations

from .document import TextDocument
from .filters import (
    BlockProximityFusion,
    CanolaFilter,
    DensityRulesClassifier,
    DocumentTitleMatchClassifier,
    ExpandTitleToContentFilter,
    FilterChain,
    IgnoreBlocksAfterContentFilter,
    KeepLargestBlockFilter,
    MarkEverythingContentFilter,
    NumWordsRulesClassifier,
    RemoveNonContentBlocksFilter,
    SimpleBlockFusionProcessor,
    TerminatingBlocksFinder,
)
from .parser import BoilerpipeParser

ARTICLE = "ArticleExtractor"
DEFAULT = "DefaultExtractor"
KEEP_EVERYTHING = "KeepEverythingExtractor"
LARGEST_CONTENT = "LargestContentExtractor"
CANOLA = "CanolaExtractor"
UNFILTERED = "Unfiltered"

EXTRACTORS = (ARTICLE, DEFAULT, KEEP_EVERYTHING, LARGEST_CONTENT, UNFILTERED)


def filter_chain_for_type(filter_type: str):
    """Boilerpipe.coffee:29-103.  Anything not matching a named
    extractor falls through to DefaultExtractor (the `else` branch)."""
    if filter_type == ARTICLE:
        return FilterChain(
            [
                TerminatingBlocksFinder(),
                DocumentTitleMatchClassifier(None, False),  # no-op, Q3
                NumWordsRulesClassifier(),
                IgnoreBlocksAfterContentFilter(),
                BlockProximityFusion(1, False, False),
                RemoveNonContentBlocksFilter(),
                BlockProximityFusion(1, True, False),
                KeepLargestBlockFilter(),
                ExpandTitleToContentFilter(),  # dead given Q3
            ]
        )
    if filter_type == LARGEST_CONTENT:
        return FilterChain(
            [
                NumWordsRulesClassifier(),
                BlockProximityFusion(1, False, False),
                KeepLargestBlockFilter(),
            ]
        )
    if filter_type == CANOLA:
        return FilterChain([CanolaFilter()])  # crashes like the reference (Q10)
    if filter_type == KEEP_EVERYTHING:
        return FilterChain([MarkEverythingContentFilter()])
    if filter_type == UNFILTERED:
        return None
    return FilterChain(
        [
            SimpleBlockFusionProcessor(),
            BlockProximityFusion(1, False, False),
            DensityRulesClassifier(),
        ]
    )


def document_from_html(html: str, filter_type: str = ARTICLE) -> TextDocument:
    """Boilerpipe.documentFromHTML (Boilerpipe.coffee:19-26)."""
    parser = BoilerpipeParser()
    document = parser.parse_document_from_html(html)
    chain = filter_chain_for_type(filter_type)
    if chain is not None:
        chain.process(document)
    return document
