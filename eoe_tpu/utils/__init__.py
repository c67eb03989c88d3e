from eoe_tpu.utils.logger import Logger  # noqa: F401


def imshow(images, nrow: int = 8, path: str = None, norm: bool = True):
    """Debug image-grid display / dump (role of the reference's
    utils/__init__.py:1-53 imshow). Saves to ``path`` (headless) or shows via
    matplotlib when a display exists."""
    import numpy as np

    imgs = np.asarray(images)
    if imgs.ndim == 3:
        imgs = imgs[None]
    if imgs.dtype != np.uint8:
        if norm:
            lo, hi = imgs.min(), imgs.max()
            imgs = (imgs - lo) / max(hi - lo, 1e-9)
        imgs = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    n, h, w, c = imgs.shape
    rows = int(np.ceil(n / nrow))
    grid = np.zeros((rows * h, nrow * w, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = imgs[i]
    if path is not None:
        from PIL import Image
        Image.fromarray(grid if c == 3 else grid[..., 0]).save(path)
        return path
    import matplotlib
    import matplotlib.pyplot as plt
    plt.figure(figsize=(nrow, rows))
    plt.imshow(grid if c == 3 else grid[..., 0], cmap=None if c == 3 else "gray")
    plt.axis("off")
    plt.show()
