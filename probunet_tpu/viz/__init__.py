from probunet_tpu.viz.plots import plot_batch, plot_sample_batch, plot_loss_curves  # noqa: F401
