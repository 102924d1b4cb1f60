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
