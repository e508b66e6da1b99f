"""Unit tests for the sweep fold-cache config hash (cli/sweep.py)."""
from pacingpseudo_tpu.cli.sweep import _config_hash
from pacingpseudo_tpu.cli.train import build_parser, config_from_args


def _args(extra=()):
    p = build_parser()
    p.add_argument("--folds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--sweep_out", type=str, default="")
    p.add_argument("--patient_regex", type=str, default="")
    return p.parse_args(["--dataset", "chaos", "--modality", "t1",
                         "--session", "Control", "--tag", "t", *extra])


def test_hash_stable_across_placement_fields():
    a = _args()
    b = _args(["--tag", "other", "--root", "/elsewhere", "--fold", "3"])
    b.folds = [2]
    assert _config_hash(a, config_from_args) == \
        _config_hash(b, config_from_args)


def test_hash_changes_with_hyperparameters():
    a = _args()
    for extra in (["--epoch", "7"], ["--init_ch", "16"], ["--lr", "0.01"],
                  ["--input_size", "64", "64"],
                  ["--compute_dtype", "float32"]):
        assert _config_hash(_args(extra), config_from_args) != \
            _config_hash(a, config_from_args), extra


def test_hash_does_not_mutate_args():
    a = _args()
    before = vars(a).copy()
    _config_hash(a, config_from_args)
    assert vars(a) == before
