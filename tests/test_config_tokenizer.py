import os

import pytest

from uvltrack_tpu.config import default_cfg, load_cfg
from uvltrack_tpu.core.tokenizer import BertTokenizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_default_cfg_keys():
    c = default_cfg()
    assert c.MODEL.HIDDEN_DIM == 384
    assert c.DATA.SEARCH.SIZE == 320
    assert c.TEST.MODE == "NL"


def test_strict_merge_rejects_unknown_key():
    c = default_cfg()
    with pytest.raises(ValueError):
        c.merge_from_dict({"MODEL": {"NO_SUCH_KEY": 1}})


def test_clone_deep_copies_lists():
    """In-place list tweaks on a clone (MILESTONES, FUSION_LAYER,
    DATASETS_NAME) must not corrupt the base config of a sibling run."""
    c = default_cfg()
    c2 = c.clone()
    c2.TRAIN.SCHEDULER.MILESTONES.append(999)
    c2.MODEL.BACKBONE.FUSION_LAYER[0] = -1
    assert 999 not in c.TRAIN.SCHEDULER.MILESTONES
    assert c.MODEL.BACKBONE.FUSION_LAYER[0] != -1


def test_merge_from_list_scalars_and_lists():
    c = default_cfg()
    c.merge_from_list([
        "TRAIN.EPOCH=7",
        "TRAIN.LR=1e-4",            # pyyaml parses this as str; must coerce
        "MODEL.HEAD.SOFTMAX_ONE=true",
        "MODEL.BACKBONE.FUSION_LAYER=[1, 2]",
        "TEST.MODE=BBOX",
    ])
    assert c.TRAIN.EPOCH == 7
    assert c.TRAIN.LR == pytest.approx(1e-4) and isinstance(c.TRAIN.LR, float)
    assert c.MODEL.HEAD.SOFTMAX_ONE is True
    assert c.MODEL.BACKBONE.FUSION_LAYER == [1, 2]
    assert c.TEST.MODE == "BBOX"


def test_merge_from_list_numeric_coercion():
    c = default_cfg()
    c.merge_from_list(["TRAIN.CONT_WEIGHT=2"])   # int into float leaf
    assert c.TRAIN.CONT_WEIGHT == 2.0 and isinstance(c.TRAIN.CONT_WEIGHT, float)
    c.merge_from_list(["TPU.GRAD_ACCUM=4"])
    assert c.TPU.GRAD_ACCUM == 4 and isinstance(c.TPU.GRAD_ACCUM, int)
    c.merge_from_list(["TPU.GRAD_ACCUM=2e0"])    # numeric str into int leaf
    assert c.TPU.GRAD_ACCUM == 2 and isinstance(c.TPU.GRAD_ACCUM, int)


def test_merge_from_list_type_mismatch_raises():
    c = default_cfg()
    with pytest.raises(ValueError):
        c.merge_from_list(["TRAIN.EPOCH=fast"])        # str into int
    with pytest.raises(ValueError):
        c.merge_from_list(["TRAIN.EPOCH=2.5"])         # fractional into int
    with pytest.raises(ValueError):
        c.merge_from_list(["MODEL.HEAD.SOFTMAX_ONE=1"])  # int into bool
    with pytest.raises(ValueError):
        c.merge_from_list(["TRAIN.LR=true"])           # bool into float


def test_merge_from_list_sections():
    c = default_cfg()
    # dict value merges strictly into the section, preserving CfgNode
    # attribute access and sibling keys
    c.merge_from_list(["TPU={GRAD_ACCUM: 2}"])
    assert c.TPU.GRAD_ACCUM == 2
    assert isinstance(c.TPU, type(c)) and c.TPU.MESH_DATA == -1  # siblings intact
    # scalar can never clobber a whole section
    with pytest.raises(ValueError):
        c.merge_from_list(["TPU=0"])
    # unknown keys inside the dict override still raise
    with pytest.raises(ValueError):
        c.merge_from_list(["TPU={NO_SUCH: 1}"])
    # the dict spelling gets the SAME leaf type guard as the dotted one:
    # wrong types raise at parse time, numeric strings coerce
    with pytest.raises(ValueError):
        c.merge_from_list(["TPU={GRAD_ACCUM: fast}"])
    c.merge_from_list(["TRAIN={LR: 1e-4}"])  # pyyaml str -> float leaf
    assert c.TRAIN.LR == pytest.approx(1e-4) and isinstance(c.TRAIN.LR, float)


def test_merge_from_list_errors():
    c = default_cfg()
    with pytest.raises(ValueError):
        c.merge_from_list(["TRAIN.EPOCH"])             # no '='
    with pytest.raises(ValueError):
        c.merge_from_list(["TRAIN.NO_SUCH=1"])         # unknown leaf
    with pytest.raises(ValueError):
        c.merge_from_list(["NOPE.LR=1"])               # unknown section
    with pytest.raises(ValueError):
        c.merge_from_list(["TRAIN.LR.X=1"])            # leaf used as section
    # `KEY=` parses to None and deliberately clears the leaf
    c.merge_from_list(["TEST.MODE="])
    assert c.TEST.MODE is None


def test_load_baseline_base_yaml():
    c = load_cfg(os.path.join(REPO, "experiments/uvltrack/baseline_base.yaml"))
    assert c.MODEL.HIDDEN_DIM == 768
    assert c.MODEL.BACKBONE.FUSION_LAYER == [6, 7, 8, 9, 10, 11]
    assert c.DATA.SEARCH.SIZE == 256
    assert c.TEST.MODE == "NLBBOX"
    assert c.MODEL.HEAD.SOFTMAX_ONE is True
    assert c.TRAIN.CONT_WEIGHT == 1.0


def test_load_baseline_large_yaml():
    c = load_cfg(os.path.join(REPO, "experiments/uvltrack/baseline_large.yaml"))
    assert c.MODEL.HIDDEN_DIM == 1024
    assert len(c.MODEL.BACKBONE.FUSION_LAYER) == 12
    assert c.TEST.MODE == "BBOX"


@pytest.fixture()
def tiny_vocab(tmp_path):
    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "the", "quick", "brown", "fox", "jump", "##ing", "##s",
        "over", "lazy", "dog", ",", ".", "!", "un", "##affable",
    ]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    return str(p)


def test_wordpiece_basic(tiny_vocab):
    tok = BertTokenizer(tiny_vocab)
    assert tok.tokenize("The quick brown fox") == ["the", "quick", "brown", "fox"]
    assert tok.tokenize("jumping") == ["jump", "##ing"]
    assert tok.tokenize("unaffable") == ["un", "##affable"]
    assert tok.tokenize("zzz") == ["[UNK]"]
    assert tok.tokenize("fox, dog.") == ["fox", ",", "dog", "."]


def test_encode_query_padding(tiny_vocab):
    tok = BertTokenizer(tiny_vocab)
    ids, mask = tok.encode_query("quick fox", 8)
    assert len(ids) == 8 and len(mask) == 8
    assert ids[0] == tok.vocab["[CLS]"]
    assert ids[3] == tok.vocab["[SEP]"]
    assert mask == [1, 1, 1, 1, 0, 0, 0, 0]
    # truncation path
    ids2, mask2 = tok.encode_query("the quick brown fox over lazy dog", 5)
    assert len(ids2) == 5 and ids2[-1] == tok.vocab["[SEP]"]


def test_tokenizer_matches_transformers_if_available(tmp_path):
    """Cross-check against HF transformers' BasicTokenizer+WordpieceTokenizer."""
    try:
        from transformers.models.bert.tokenization_bert import BasicTokenizer, WordpieceTokenizer
    except Exception:
        pytest.skip("transformers bert tokenizer not importable")
    words = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "track", "##ing", "the", "red",
        "car", "on", "high", "##way", ",", "person", "walk", "##s", "a",
    ]
    p = tmp_path / "v.txt"
    p.write_text("\n".join(words) + "\n")
    mine = BertTokenizer(str(p))
    basic = BasicTokenizer(do_lower_case=True)
    wp = WordpieceTokenizer(vocab={w: i for i, w in enumerate(words)}, unk_token="[UNK]")
    for text in [
        "Tracking the RED car, on highway!",
        "a person walks",
        "the  the\tthe\nthe",
        "café walks",  # accent stripping
    ]:
        want = []
        for w in basic.tokenize(text):
            want.extend(wp.tokenize(w))
        assert mine.tokenize(text) == want, text
