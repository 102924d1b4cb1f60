"""CLI flag compatibility: the reference README command lines must parse to
the right config (BASELINE.md requires the public CLI preserved)."""

from michigan_tpu.config import demo_options, test_options, train_options


def test_reference_readme_inference_flags():
    # README.md:49-53 command for single inference
    argv = (
        "--name MichiGAN --gpu_ids 0 --inference_ref_name 67172 "
        "--inference_tag_name 67172 --inference_orient_name 67172 "
        "--netG spadeb --use_encoder --noise_background --use_ig "
        "--expand_mask_be --expand_th 5 --use_stroke --add_feat_zeros "
        "--data_dir ./datasets/FFHQ_single --which_epoch 50"
    ).split()
    opt = test_options(argv)
    assert not opt.isTrain
    assert opt.netG == "spadeb" and opt.use_encoder and opt.use_ig
    assert opt.noise_background and opt.use_stroke and opt.add_feat_zeros
    assert opt.expand_mask_be and opt.expand_th == 5
    assert opt.which_epoch == "50"
    assert opt.crop_size == 512 and opt.semantic_nc == 2
    assert opt.latent_size() == (9, 9)  # (512+64)/64 with add_feat_zeros
    assert opt.generator_input_size() == 576


def test_reference_readme_train_flags():
    # README.md:60 training command shape
    argv = (
        "--name MichiGAN --batchSize 8 --gpu_ids 0,1,2,3,4,5,6,7 "
        "--load_size 568 --crop_size 512 --use_encoder --use_ig "
        "--noise_background --random_expand_mask --niter 50"
    ).split()
    opt = train_options(argv)
    assert opt.isTrain and opt.batchSize == 8
    assert opt.load_size == 568 and opt.crop_size == 512
    assert opt.num_gpus == 8
    assert opt.niter == 50 and opt.niter_decay == 0
    assert opt.gan_mode == "hinge" and not opt.no_TTUR
    assert opt.lambda_orient == 10.0 and opt.lambda_confidence == 100.0
    assert opt.latent_size() == (8, 8)


def test_demo_default_flagset():
    opt = demo_options([])
    # demo_options.py:12-31 released-model configuration
    assert opt.netG == "spadeb" and opt.use_encoder and opt.use_ig
    assert opt.use_stroke and opt.noise_background and opt.add_feat_zeros
    assert opt.expand_mask_be and opt.which_epoch == "50"
    assert opt.expand_th == 5 and opt.crop_size == 512
    assert opt.name == "MichiGAN" and not opt.isTrain


def test_spade_and_d_channel_derivations():
    opt = train_options([])
    assert opt.spade_label_nc() == 4  # label 2 + orient 2
    assert opt.d_input_nc() == 7      # label 2 + image 3 + orient 2


def test_noop_flag_registry_is_exact():
    """Every Options flag must either be read somewhere in the framework or
    appear in Options.KNOWN_NOOP_FLAGS — and no listed noop flag may be
    secretly read.  Guards against new dead flags appearing silently
    (round-1 VERDICT weak #7)."""
    import dataclasses
    import os
    import re

    from michigan_tpu.config import Options

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sources = []
    for base, _, files in os.walk(os.path.join(root, "michigan_tpu")):
        sources += [os.path.join(base, f) for f in files if f.endswith(".py")]
    sources += [
        os.path.join(root, f)
        for f in ("train.py", "inference.py", "demo.py", "evaluate.py",
                  "cal_orientation.py", "bench.py", "__graft_entry__.py")
        if os.path.exists(os.path.join(root, f))
    ]
    config_path = os.path.join(root, "michigan_tpu", "config.py")
    blob_parts = []
    for path in sources:
        with open(path) as f:
            text = f.read()
        if os.path.abspath(path) == os.path.abspath(config_path):
            # strip the KNOWN_NOOP_FLAGS registry itself (its quoted names
            # must not count as reads), then keep only attribute accesses
            # (method bodies) by dropping dataclass field definitions
            text = re.sub(
                r"KNOWN_NOOP_FLAGS = frozenset\(\{.*?\}\)", "", text,
                flags=re.DOTALL,
            )
            text = "\n".join(
                line for line in text.splitlines()
                if not re.match(r"\s+\w+\s*:\s*\w+.*=", line)
            )
        blob_parts.append(text)
    blob = "\n".join(blob_parts)

    unread = set()
    for field in dataclasses.fields(Options):
        name = field.name
        # a flag counts as read if attribute-accessed (.name) or looked up
        # by string ("name" — getattr / dict key)
        if not re.search(rf"\.{name}\b|['\"]{name}['\"]", blob):
            unread.add(name)

    noop = set(Options.KNOWN_NOOP_FLAGS)
    assert unread - noop == set(), (
        f"flags silently unread (add wiring or list in KNOWN_NOOP_FLAGS): "
        f"{sorted(unread - noop)}"
    )
    assert noop - unread == set(), (
        f"KNOWN_NOOP_FLAGS entries that ARE read (remove from the list): "
        f"{sorted(noop - unread)}"
    )
