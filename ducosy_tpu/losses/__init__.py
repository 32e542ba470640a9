from ducosy_tpu.losses.suite import LossTerms, generator_loss, discriminator_loss  # noqa: F401
