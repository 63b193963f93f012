// Scripted stand-in for libale_c.so (the atari_py C-wrapper ABI that
// ale_backend.cc dlopen's) — a TEST FIXTURE, not a game. Lets the real-ALE
// plumbing (minimal-action remap, config call sequence matching reference
// env.py:13-20, grayscale screen copy, lives/game-over flow) run end-to-end
// in an image that ships no ALE and no ROMs.
//
// Scripted behavior, chosen so every engine semantic is observable:
//   * minimal action set {0, 11, 12, 14} — NON-contiguous, so a missing
//     index->ALE-code remap is caught (reward echoes the raw ALE code).
//   * lives start at 3 and drop every 100 episode frames: frame 100 and 200
//     are life-loss pseudo-terminals (lives stays > 0), frame 300 drops to 0
//     (the lives>0 Q*bert guard path), frame 400 is true game over.
//   * screen: a bright bar sweeping one row per frame + an action-coded
//     stripe, so frame progression and action plumbing show up in pixels.
// Build: make ale_stub  ->  libale_stub.so; point RAINBOW_ALE_LIB at it and
// RAINBOW_ALE_ROM_DIR at a dir containing <game>.bin.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

namespace {

struct Stub {
  int episode_frame = 0;
  int lives = 3;
  int last_action = 0;
  int random_seed = -1;
  float repeat_prob = -1.0f;
  int frame_skip = -1;
  int color_avg = 1;
  std::string rom;
};

char g_log[512];  // last loadROM's observed configuration (test side-channel)

}  // namespace

extern "C" {

void* ALE_new() { return new Stub(); }
void ALE_del(void* p) { delete static_cast<Stub*>(p); }

void setInt(void* p, const char* k, int v) {
  Stub* s = static_cast<Stub*>(p);
  if (!std::strcmp(k, "random_seed")) s->random_seed = v;
  if (!std::strcmp(k, "frame_skip")) s->frame_skip = v;
}

void setBool(void* p, const char* k, bool v) {
  if (!std::strcmp(k, "color_averaging"))
    static_cast<Stub*>(p)->color_avg = v ? 1 : 0;
}

void setFloat(void* p, const char* k, float v) {
  if (!std::strcmp(k, "repeat_action_probability"))
    static_cast<Stub*>(p)->repeat_prob = v;
}

void loadROM(void* p, const char* rom) {
  Stub* s = static_cast<Stub*>(p);
  s->rom = rom;
  s->episode_frame = 0;
  s->lives = 3;
  std::snprintf(g_log, sizeof g_log,
                "seed=%d repeat=%.1f skip=%d avg=%d rom=%s", s->random_seed,
                s->repeat_prob, s->frame_skip, s->color_avg, rom);
}

// Test side-channel: the configuration observed at the last loadROM.
const char* stub_config_log() { return g_log; }

int act(void* p, int a) {
  Stub* s = static_cast<Stub*>(p);
  s->last_action = a;
  ++s->episode_frame;
  if (s->episode_frame % 100 == 0 && s->lives > 0) --s->lives;
  return a;  // reward echoes the RAW ALE action code: verifies the
             // minimal-action-set remap end-to-end through the engine
}

bool game_over(void* p) { return static_cast<Stub*>(p)->episode_frame >= 400; }

void reset_game(void* p) {
  Stub* s = static_cast<Stub*>(p);
  s->episode_frame = 0;
  s->lives = 3;
  s->last_action = 0;
}

int lives(void* p) { return static_cast<Stub*>(p)->lives; }

int getMinimalActionSize(void*) { return 4; }

void getMinimalActionSet(void*, int* out) {
  out[0] = 0;
  out[1] = 11;
  out[2] = 12;
  out[3] = 14;
}

// Screen geometry: 210x160 by default; STUB_SCREEN="HxW" overrides so the
// engine's defensive clamp for odd ALE screen sizes (ale_backend.cc
// screen()) can be exercised end-to-end.
static void screen_dims(int* h, int* w) {
  *h = 210;
  *w = 160;
  if (const char* s = std::getenv("STUB_SCREEN"))
    std::sscanf(s, "%dx%d", h, w);
}

int getScreenWidth(void*) {
  int h, w;
  screen_dims(&h, &w);
  return w;
}
int getScreenHeight(void*) {
  int h, w;
  screen_dims(&h, &w);
  return h;
}

void getScreenGrayscale(void* p, unsigned char* out) {
  Stub* s = static_cast<Stub*>(p);
  int h, w;
  screen_dims(&h, &w);
  std::memset(out, 0, (size_t)h * w);
  int row = s->episode_frame % (h - 10);
  std::memset(out + (size_t)row * w, 255, w);                      // sweep bar
  std::memset(out + (size_t)(h - 5) * w, 10 * (s->last_action + 1), w);  // action stripe
}

}  // extern "C"
