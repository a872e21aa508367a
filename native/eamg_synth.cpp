// EAMG-TPU native host synthesizer.
//
// The same additive-synthesis algorithm as the on-device renderer
// (eamg_tpu/audio/synth.py — per-GM-family harmonic banks + ADSR, shaped
// noise for drums), in C++ for hosts without an accelerator. The timbre
// tables MUST stay in sync with _FAMILY_TIMBRES in synth.py; the parity
// test (tests/test_native_synth.py) compares waveforms against the JAX
// renderer.
//
// Build: g++ -O3 -shared -fPIC -o libeamg_synth.so eamg_synth.cpp

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kSampleRate = 22050;
constexpr int kHarmonics = 8;

// family index = GM program / 8; {amps[8], attack, decay, sustain, release}
// -- keep in sync with synth.py _FAMILY_TIMBRES.
const float kAmps[16][kHarmonics] = {
    {1.0f, 0.55f, 0.32f, 0.2f, 0.12f, 0.07f, 0.04f, 0.02f},
    {1.0f, 0.0f, 0.45f, 0.0f, 0.25f, 0.0f, 0.1f, 0.0f},
    {0.9f, 0.6f, 0.5f, 0.4f, 0.3f, 0.25f, 0.2f, 0.15f},
    {1.0f, 0.6f, 0.35f, 0.22f, 0.12f, 0.07f, 0.03f, 0.02f},
    {1.0f, 0.5f, 0.2f, 0.08f, 0.03f, 0.01f, 0.0f, 0.0f},
    {1.0f, 0.75f, 0.55f, 0.4f, 0.3f, 0.22f, 0.15f, 0.1f},
    {1.0f, 0.7f, 0.5f, 0.38f, 0.28f, 0.2f, 0.14f, 0.1f},
    {0.9f, 1.0f, 0.8f, 0.6f, 0.45f, 0.3f, 0.2f, 0.12f},
    {1.0f, 0.4f, 0.7f, 0.3f, 0.45f, 0.2f, 0.25f, 0.1f},
    {1.0f, 0.25f, 0.08f, 0.03f, 0.01f, 0.0f, 0.0f, 0.0f},
    {1.0f, 0.9f, 0.75f, 0.6f, 0.5f, 0.4f, 0.32f, 0.25f},
    {1.0f, 0.7f, 0.5f, 0.35f, 0.25f, 0.18f, 0.12f, 0.08f},
    {0.8f, 0.5f, 0.9f, 0.3f, 0.6f, 0.2f, 0.4f, 0.1f},
    {1.0f, 0.55f, 0.4f, 0.3f, 0.2f, 0.12f, 0.08f, 0.05f},
    {1.0f, 0.4f, 0.6f, 0.25f, 0.35f, 0.15f, 0.2f, 0.08f},
    {0.6f, 0.4f, 0.5f, 0.3f, 0.4f, 0.25f, 0.3f, 0.2f},
};
const float kAdsr[16][4] = {
    {0.004f, 0.9f, 0.12f, 0.15f}, {0.002f, 0.6f, 0.05f, 0.2f},
    {0.02f, 0.05f, 0.9f, 0.08f},  {0.003f, 0.7f, 0.1f, 0.12f},
    {0.005f, 0.5f, 0.3f, 0.1f},   {0.08f, 0.15f, 0.8f, 0.25f},
    {0.12f, 0.2f, 0.85f, 0.3f},   {0.05f, 0.1f, 0.8f, 0.15f},
    {0.04f, 0.1f, 0.8f, 0.12f},   {0.05f, 0.1f, 0.85f, 0.15f},
    {0.01f, 0.05f, 0.9f, 0.08f},  {0.25f, 0.3f, 0.85f, 0.4f},
    {0.1f, 0.2f, 0.7f, 0.3f},     {0.01f, 0.4f, 0.3f, 0.2f},
    {0.002f, 0.3f, 0.05f, 0.1f},  {0.05f, 0.3f, 0.4f, 0.2f},
};

struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ull) {}
  double uniform() {  // [-1, 1)
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return 2.0 * (double)(s >> 11) / (double)(1ull << 53) - 1.0;
  }
};

inline float envelope(float t, float dur, const float* adsr) {
  float attack = adsr[0], decay = adsr[1], sustain = adsr[2],
        release = adsr[3];
  float env_a = t / (attack > 1e-4f ? attack : 1e-4f);
  if (env_a > 1.0f) env_a = 1.0f;
  float d = (t - attack) / (decay > 1e-4f ? decay : 1e-4f);
  if (d < 0.0f) d = 0.0f;
  if (d > 1.0f) d = 1.0f;
  float env_d = 1.0f - (1.0f - sustain) * d;
  float env = env_a < env_d ? env_a : env_d;
  float rel = t - dur;
  if (rel > 0.0f) {
    float r = 1.0f - rel / (release > 1e-4f ? release : 1e-4f);
    env *= r > 0.0f ? r : 0.0f;
  }
  if (t >= dur + release) env = 0.0f;
  return env;
}

}  // namespace

extern "C" {

// Render n_notes into out[n_samples] (caller-zeroed float32 buffer).
// freq/start/dur in Hz/seconds; vel 0-127; family 0-15; drum 0/1.
// Returns 0 on success.
int eamg_render(const double* freq, const double* start, const double* dur,
                const double* vel, const int32_t* family,
                const uint8_t* drum, int n_notes, int n_samples, int seed,
                float* out) {
  for (int n = 0; n < n_notes; ++n) {
    int fam = family[n] & 15;
    const float* amps = kAmps[fam];
    const float* adsr = kAdsr[fam];
    float d = (float)dur[n];
    if (d < 0.02f) d = 0.02f;
    float release = adsr[3];
    int start_idx = (int)std::lround(start[n] * kSampleRate);
    int len = (int)((d + release) * kSampleRate) + 1;
    float gain = (float)(vel[n] / 127.0) * 0.2f;
    double f0 = freq[n];
    XorShift rng((uint64_t)seed * 0x9E3779B97F4A7C15ull + n + 1);
    // precompute alias-masked harmonic set
    float h_amp[kHarmonics];
    for (int h = 0; h < kHarmonics; ++h)
      h_amp[h] = (f0 * (h + 1) < kSampleRate / 2.0) ? amps[h] : 0.0f;
    for (int i = 0; i < len; ++i) {
      int idx = start_idx + i;
      if (idx < 0) continue;
      if (idx >= n_samples) idx = n_samples - 1;  // clamp like the JAX path
      float t = (float)i / kSampleRate;
      float env = envelope(t, d, adsr);
      if (env <= 0.0f) continue;
      float wave;
      if (drum[n]) {
        wave = (float)rng.uniform();
      } else {
        double phase = 2.0 * M_PI * f0 * t;
        float acc = 0.0f;
        for (int h = 0; h < kHarmonics; ++h)
          if (h_amp[h] != 0.0f)
            acc += (float)std::sin(phase * (h + 1)) * h_amp[h];
        wave = acc;
      }
      out[idx] += wave * env * gain;
    }
  }
  return 0;
}

// ---- SF2 sampled-voice twin (eamg_tpu/audio/sampler.py) -------------
//
// Host twin of the device renderer's per-voice math: linear-interp PCM
// read with loop wrap, the DAHDSS+R envelope, and the SF2 §8.4 default
// velocity modulators' closed forms (sf2.py vel_to_atten_cb /
// vel_to_fc_cents). The initialFilterFc low-pass is NOT twinned — the
// device path applies it as a zero-phase rfft magnitude multiply, which
// has no cheap streaming host equivalent; the spectral tests own that
// tier. Parity: tests/test_native_synth.py renders the same voice both
// ways and compares waveforms.

// §8.4.1: velocity -> initialAttenuation (concave, negative), as linear
// gain. Must match sf2.vel_to_atten_cb composed with _cb_to_gain.
double eamg_vel2att_gain(double vel, double amount_cb) {
  double v = vel < 1.0 ? 1.0 : (vel > 127.0 ? 127.0 : vel);
  double cb = amount_cb * (40.0 / 96.0) * std::log10(127.0 / v);
  if (cb < 0.0) cb = 0.0;
  return std::pow(10.0, -cb / 200.0);
}

// §8.4.2: velocity -> initialFilterFc offset applied to the raw cents,
// converted to Hz (8.176 Hz at 0 absolute cents), capped open at 20 kHz.
double eamg_vel2fc_hz(double fc_cents, double vel, double amount_cents) {
  double v = vel < 0.0 ? 0.0 : (vel > 127.0 ? 127.0 : vel);
  double c = fc_cents + amount_cents * (127.0 - v) / 128.0;
  double hz = 8.176 * std::pow(2.0, c / 1200.0);
  return hz < 20000.0 ? hz : 20000.0;
}

// One voice accumulated into out[n_total] (caller-zeroed). Mirrors
// _render_voices (sampler.py) minus the filter: sample-exact in float64
// against the float32 device kernel within ~1e-3.
int eamg_sf2_voice(const float* bank, int64_t bank_len, double pos0,
                   double end, double loop_s, double loop_e, int loops,
                   double ratio, double t_start, double dur, double gain,
                   double delay, double attack, double hold, double decay,
                   double sustain, double release, double vib_cents,
                   double vib_hz, double vib_delay, int n_total,
                   int d_samples, float* out) {
  const double kLn2 = 0.6931471805599453;
  double w = 2.0 * M_PI * (vib_hz > 1e-3 ? vib_hz : 1e-3);
  double vib_amp = vib_cents * (kLn2 / 1200.0);
  double durc = dur > 1e-3 ? dur : 1e-3;
  double lw = loop_e - loop_s;
  if (lw < 1.0) lw = 1.0;
  int start_idx = (int)std::lround(t_start * kSampleRate);
  for (int i = 0; i < d_samples; ++i) {
    double tt = (double)i / kSampleRate;
    double t_act = tt - vib_delay;
    if (t_act < 0.0) t_act = 0.0;
    double vib_pos = vib_amp * (1.0 - std::cos(w * t_act)) / w;
    double sp = pos0 + ((double)i + vib_pos * kSampleRate) * ratio;
    if (loops && sp >= loop_e) sp = loop_s + std::fmod(sp - loop_s, lw);
    bool in_data = sp < end - 1.0;
    if (sp < 0.0) sp = 0.0;
    double maxp = (double)bank_len - 2.0;
    if (sp > maxp) sp = maxp;
    int64_t i0 = (int64_t)sp;
    double frac = sp - (double)i0;
    double pcm = bank[i0] * (1.0 - frac) + bank[i0 + 1] * frac;
    // DAHDSS on the output clock, release after note-off
    double t2 = delay + attack, t3 = t2 + hold;
    double env = (tt - delay) / (attack > 1e-4 ? attack : 1e-4);
    if (env < 0.0) env = 0.0;
    if (env > 1.0) env = 1.0;
    if (tt > t3) {
      double dec = (tt - t3) / (decay > 1e-4 ? decay : 1e-4);
      if (dec > 1.0) dec = 1.0;
      env = 1.0 - (1.0 - sustain) * dec;
    } else if (tt > t2) {
      env = 1.0;
    }
    double rel = tt - durc;
    if (rel < 0.0) rel = 0.0;
    double rg = 1.0 - rel / (release > 1e-4 ? release : 1e-4);
    if (rg < 0.0) rg = 0.0;
    if (rg > 1.0) rg = 1.0;
    env *= rg;
    int idx = start_idx + i;
    if (idx < 0) idx = 0;
    if (idx >= n_total) idx = n_total - 1;
    if (in_data) out[idx] += (float)(pcm * env * gain);
  }
  return 0;
}

}  // extern "C"
