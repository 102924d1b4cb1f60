"""Loss zoo (reference models/networks/loss.py) as pure functions."""

from michigan_tpu.losses.gan import gan_loss, multiscale_gan_loss
from michigan_tpu.losses.feat import gan_feat_loss
from michigan_tpu.losses.perceptual import (
    style_content_loss,
    style_content_loss_from_features,
    vgg_loss,
    vgg_loss_from_features,
)
from michigan_tpu.losses.orient import orient_loss
from michigan_tpu.losses.color import (
    lab_color_loss,
    hair_avg_lab_loss,
    rgb_background_l1_loss,
    kld_loss,
)
