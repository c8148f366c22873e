"""Visual artifact generation: alignment heatmaps, spectrogram comparisons, waveplots.

Parity with reference tacotron/utils/plot.py and wavenet_vocoder/util.py:174-233."""

import numpy as np

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402


def split_title_line(title_text: str, max_words: int = 5) -> str:
    seq = title_text.split()
    return '\n'.join([' '.join(seq[i:i + max_words]) for i in range(0, len(seq), max_words)])


def plot_alignment(alignment: np.ndarray, path: str, title: str = None,
                   split_title: bool = False, max_len: int = None):
    if max_len is not None:
        alignment = alignment[:, :max_len]
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111)
    im = ax.imshow(alignment, aspect='auto', origin='lower', interpolation='none')
    fig.colorbar(im, ax=ax)
    xlabel = 'Decoder timestep'
    if title is not None:
        if split_title:
            title = split_title_line(title)
        plt.title(title)
    plt.xlabel(xlabel)
    plt.ylabel('Encoder timestep')
    plt.tight_layout()
    plt.savefig(path, format='png')
    plt.close(fig)


def plot_spectrogram(pred_spectrogram: np.ndarray, path: str, title: str = None,
                     split_title: bool = False, target_spectrogram: np.ndarray = None,
                     max_len: int = None, auto_aspect: bool = False):
    if max_len is not None:
        if target_spectrogram is not None:
            target_spectrogram = target_spectrogram[:max_len]
        pred_spectrogram = pred_spectrogram[:max_len]
    if title is not None and split_title:
        title = split_title_line(title)

    fig = plt.figure(figsize=(10, 8))
    if target_spectrogram is not None:
        ax1 = fig.add_subplot(311)
        ax2 = fig.add_subplot(312)
        im = ax1.imshow(np.rot90(target_spectrogram), aspect='auto' if auto_aspect else None,
                        interpolation='none')
        ax1.set_title('Target Mel-Spectrogram')
        fig.colorbar(mappable=im, shrink=0.65, orientation='horizontal', ax=ax1)
        ax2.set_title('Predicted Mel-Spectrogram')
    else:
        ax2 = fig.add_subplot(211)
    im = ax2.imshow(np.rot90(pred_spectrogram), aspect='auto' if auto_aspect else None,
                    interpolation='none')
    fig.colorbar(mappable=im, shrink=0.65, orientation='horizontal', ax=ax2)
    if title is not None:
        fig.suptitle(title)
    plt.tight_layout()
    plt.savefig(path, format='png')
    plt.close(fig)


def waveplot(path: str, y_hat: np.ndarray, y_target: np.ndarray, hparams,
             title: str = None):
    sr = hparams.sample_rate
    fig = plt.figure(figsize=(16, 6))
    if y_target is not None:
        ax = plt.subplot(2, 1, 1)
        t = np.arange(len(y_target)) / sr
        ax.plot(t, y_target, linewidth=0.5)
        ax.set_title('Target waveform')
        ax = plt.subplot(2, 1, 2)
    else:
        ax = plt.subplot(1, 1, 1)
    t = np.arange(len(y_hat)) / sr
    ax.plot(t, y_hat, linewidth=0.5)
    ax.set_title('Predicted waveform')
    if title is not None:
        fig.suptitle(title)
    plt.tight_layout()
    plt.savefig(path, format='png')
    plt.close(fig)
