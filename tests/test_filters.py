"""Filter specs ported 1:1 from the reference tests/Tests.coffee:173-401."""

import pytest

from boilerpipe_coffee_spark.core.document import (
    END_OF_TEXT,
    MIGHT_BE_CONTENT,
    TITLE,
)
from boilerpipe_coffee_spark.core.filters import (
    BlockProximityFusion,
    DensityRulesClassifier,
    DocumentTitleMatchClassifier,
    ExpandTitleToContentFilter,
    IgnoreBlocksAfterContentFilter,
    InvertedFilter,
    KeepLargestBlockFilter,
    MarkEverythingContentFilter,
    MinClauseWordsFilter,
    NumWordsRulesClassifier,
    RemoveNonContentBlocksFilter,
    SimpleBlockFusionProcessor,
    SplitParagraphBlocksFilter,
    TerminatingBlocksFinder,
)
from boilerpipe_coffee_spark.core.jsquirks import ReferenceThrow

from helpers import document_with_parameters


def test_mark_everything_content():  # Tests.coffee:173-186
    document = document_with_parameters([5, 100, 80], None, [False, True, False])
    MarkEverythingContentFilter().process(document)
    assert [b.is_content for b in document.text_blocks] == [True, True, True]


def test_inverted():  # Tests.coffee:190-203
    document = document_with_parameters([5, 100, 80], None, [False, True, False])
    assert InvertedFilter().process(document) is True
    assert [b.is_content for b in document.text_blocks] == [True, False, True]


def test_terminating_blocks_finder():  # Tests.coffee:207-225
    document = document_with_parameters(
        [
            "Comments",
            "Please have your say",
            "48 Comments today",
            "Comments can be the first word of article text.  If there are "
            "many words in the block, it is not comments",
            "Thanks for your comments - this feedback is now closed",
        ]
    )
    changed = TerminatingBlocksFinder().process(document)
    got = [b.has_label(END_OF_TEXT) for b in document.text_blocks]
    assert got == [True, True, True, False, True]
    assert changed is True


def test_document_title_match_classifier():  # Tests.coffee:229-243
    document = document_with_parameters(
        ["News", "This is the real title", "Red herring"]
    )
    document.title = "News - This is the real title"
    changed = DocumentTitleMatchClassifier(None, True).process(document)
    assert [b.labels for b in document.text_blocks] == [[], [TITLE], []]
    assert changed is True


def test_num_words_rules_negative():  # Tests.coffee:249-257
    document = document_with_parameters(
        [2, 10, 10], [0, 0, 0], [True, True, True]
    )
    changed = NumWordsRulesClassifier().process(document)
    assert document.text_blocks[1].is_content is False
    assert changed is True


def test_num_words_rules_positive():  # Tests.coffee:260-266
    document = document_with_parameters(
        [10, 10, 10], [0, 0, 0], [True, True, True]
    )
    changed = NumWordsRulesClassifier().process(document)
    assert document.text_blocks[1].is_content is True
    assert changed is True


def test_min_clause_words():  # Tests.coffee:270-282
    content = [
        "This is a clause, because it is separated by a comma.",
        "Real short",
        "Lots of, very, very, very, small, clauses.",
        "If acceptClausesWithoutDelimiter is false then clauses that "
        "don't end in punctuation don't count",
    ]
    document = document_with_parameters(content, None, [True, True, True, True])
    changed = MinClauseWordsFilter(5, False).process(document)
    assert [b.is_content for b in document.text_blocks] == [
        True,
        False,
        False,
        False,
    ]
    assert changed is True


def test_split_paragraph_blocks():  # Tests.coffee:286-301
    document = document_with_parameters(
        ["A single paragraph.", "Multiple paragraphs.\n\nParagraph 2 is here."],
        None,
        [True, False],
    )
    changed = SplitParagraphBlocksFilter().process(document)
    assert [b.text for b in document.text_blocks] == [
        "A single paragraph.",
        "Multiple paragraphs.",
        "Paragraph 2 is here.",
    ]
    assert [b.is_content for b in document.text_blocks] == [True, False, False]
    assert changed is True


def test_ignore_blocks_after_content():  # Tests.coffee:305-317
    document = document_with_parameters(
        [10, 30, 50, 80, 20],
        None,
        [False, True, True, True, True],
        [END_OF_TEXT, None, None, END_OF_TEXT, None],
    )
    changed = IgnoreBlocksAfterContentFilter(60).process(document)
    assert [b.is_content for b in document.text_blocks] == [
        False,
        True,
        True,
        False,
        False,
    ]
    assert changed is True


def test_block_proximity_fusion():  # Tests.coffee:321-336
    document = document_with_parameters(
        [10, 10, 10, 10, 10, 10, 10],
        None,
        [False, True, True, True, True, True, False],
    )
    changed = BlockProximityFusion(1, True, False).process(document)
    assert [
        [b.offset_start, b.offset_end] for b in document.text_blocks
    ] == [[0, 0], [1, 5], [6, 6]]
    assert changed is True


def test_remove_non_content_blocks():  # Tests.coffee:340-354
    document = document_with_parameters(
        [5, 100, 10, 50, 80], None, [False, True, False, True, False]
    )
    expected_blocks = [document.text_blocks[1], document.text_blocks[3]]
    changed = RemoveNonContentBlocksFilter().process(document)
    assert [b.is_content for b in document.text_blocks] == [True, True]
    assert document.text_blocks == expected_blocks
    assert changed is True


def test_keep_largest_block():  # Tests.coffee:358-369
    document = document_with_parameters(
        [10, 10, 50, 10], None, [False, True, True, True]
    )
    changed = KeepLargestBlockFilter().process(document)
    assert [b.is_content for b in document.text_blocks] == [
        False,
        False,
        True,
        False,
    ]
    assert changed is True


def test_expand_title_to_content():  # Tests.coffee:373-386
    document = document_with_parameters(
        [10, 10, 10, 10],
        None,
        [False, False, False, True],
        [
            MIGHT_BE_CONTENT,
            [MIGHT_BE_CONTENT, TITLE],
            MIGHT_BE_CONTENT,
            MIGHT_BE_CONTENT,
        ],
    )
    changed = ExpandTitleToContentFilter().process(document)
    assert [b.is_content for b in document.text_blocks] == [
        False,
        True,
        True,
        True,
    ]
    assert changed is True


def test_density_rules_classifier():  # Tests.coffee:390-400
    document = document_with_parameters(
        [10, 10, 5], [10, 0, 0], [True, True, True]
    )
    changed = DensityRulesClassifier().process(document)
    assert document.text_blocks[1].is_content is False
    assert changed is True


# --- quirk-ledger regression tests (SURVEY.md section 2.8), verified
# against the compiled reference during the differential fuzz ---------


def test_q7_remove_skips_after_removal():
    """Runs of consecutive non-content blocks are alternately removed."""
    document = document_with_parameters(
        [10, 10, 10, 10, 10], None, [False, False, False, False, True]
    )
    RemoveNonContentBlocksFilter().process(document)
    # scan: remove idx0 (skip idx1), remove idx2' (=orig 3? no: after
    # removing 0, list=[1,2,3,4]; i=1 -> orig 2 removed; i=2 -> orig 4
    # kept (content).  Survivors: orig 1 (NC), orig 3 (NC), orig 4 (C).
    assert [b.offset_start for b in document.text_blocks] == [1, 3, 4]


def test_q8_tie_goes_to_later_block():
    document = document_with_parameters(
        [20, 5, 20], None, [True, True, True]
    )
    KeepLargestBlockFilter().process(document)
    assert [b.is_content for b in document.text_blocks] == [False, False, True]


def test_q9_keep_largest_throws_on_no_content():
    document = document_with_parameters([10, 10], None, [False, False])
    with pytest.raises(ReferenceThrow):
        KeepLargestBlockFilter().process(document)


def test_q5_content_only_fusion_noop_when_first_block_is_content():
    document = document_with_parameters(
        [10, 10, 10], None, [True, True, True]
    )
    assert BlockProximityFusion(1, True, False).process(document) is False
    assert len(document.text_blocks) == 3


def test_q6_content_merges_into_non_content_previous():
    document = document_with_parameters([3, 30], None, [False, True])
    BlockProximityFusion(1, False, False).process(document)
    assert len(document.text_blocks) == 1
    tb = document.text_blocks[0]
    assert tb.is_content  # |= true
    assert tb.offset_start == 0 and tb.offset_end == 1


def test_simple_fusion_chains_on_recomputed_density():
    # three blocks with equal density merge pairwise left-to-right
    document = document_with_parameters([10, 10, 10])
    changed = SimpleBlockFusionProcessor().process(document)
    assert changed is True
    assert len(document.text_blocks) == 1


def test_q10_min_words_filter_strict_crashes_like_reference():
    from boilerpipe_coffee_spark.core.filters import MinWordsFilter

    document = document_with_parameters([10, 20], None, [True, True])
    with pytest.raises(ReferenceThrow):
        MinWordsFilter(5, strict=True).process(document)
    # no content blocks -> the broken identifiers are never reached
    doc2 = document_with_parameters([10, 20], None, [False, False])
    assert MinWordsFilter(5, strict=True).process(doc2) is False
    # intended semantics (non-strict)
    doc3 = document_with_parameters([2, 20], None, [True, True])
    assert MinWordsFilter(5, strict=False).process(doc3) is True
    assert [b.is_content for b in doc3.text_blocks] == [False, True]


def test_q10_canola_strict_crashes_intended_mode_classifies():
    from boilerpipe_coffee_spark.core.filters import CanolaFilter

    document = document_with_parameters([25, 3, 25], None, [False, False, False])
    with pytest.raises(ReferenceThrow):
        CanolaFilter(strict=True).process(document)
    CanolaFilter(strict=False).process(document)
    # cond2: numWords > 19 -> content for the long blocks
    assert [b.is_content for b in document.text_blocks][0] is True
    assert [b.is_content for b in document.text_blocks][2] is True
