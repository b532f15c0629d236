// yololp_runner — native C++ inference client over the PJRT C API.
//
// TPU-native equivalent of the reference's TensorRT C++ demo
// (deploy/TensorRT/yolov6.cpp): loads a StableHLO end-to-end artifact
// (exported by yololp_tpu.export with decode+NMS compiled into the graph),
// dlopens any PJRT plugin (libaxon_pjrt.so / libtpu.so / a CPU plugin),
// compiles once, then runs JPEG -> letterbox -> device -> (max_det, 28)
// detections, printing plate strings and optionally drawing results.
//
// Build: make -C deploy/pjrt_cpp
// Run:   ./yololp_runner --plugin /opt/axon/libaxon_pjrt.so \
//            --model model.stablehlo --copts model.stablehlo.copts \
//            --image plate.jpg --size 640 [--out annotated.jpg]

#include <dlfcn.h>
#include <unistd.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

// plate vocabularies (data/dataset.yaml); province glyphs are UTF-8
const char* kPro[] = {"皖", "沪", "津", "渝", "冀", "晋", "蒙", "辽", "吉",
                      "黑", "苏", "浙", "京", "闽", "赣", "鲁", "豫", "鄂",
                      "湘", "粤", "桂", "琼", "川", "贵", "云", "藏", "陕",
                      "甘", "青", "宁", "新"};
const char* kAlp = "ABCDEFGHJKLMNPQRSTUVWXYZ";
const char* kAds[] = {"A", "B", "C", "D", "E", "F", "G", "H", "J", "K", "L",
                      "M", "N", "P", "Q", "R", "S", "T", "U", "V", "W", "X",
                      "Y", "Z", "0", "1", "2", "3", "4", "5", "6", "7", "8",
                      "9", "警", "学", "O"};

const PJRT_Api* g_api = nullptr;

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "PJRT error in %s: %.*s\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  std::exit(1);
}

void AwaitEvent(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  Check(g_api->PJRT_Event_Await(&args), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  g_api->PJRT_Event_Destroy(&dargs);
}

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(1);
  }
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

// letterbox (data_augment.py:30 semantics, auto=False square pad)
cv::Mat Letterbox(const cv::Mat& img, int size, float* ratio_out) {
  float r = std::min(size / static_cast<float>(img.rows),
                     size / static_cast<float>(img.cols));
  int new_w = static_cast<int>(std::lround(img.cols * r));
  int new_h = static_cast<int>(std::lround(img.rows * r));
  cv::Mat resized;
  cv::resize(img, resized, cv::Size(new_w, new_h), 0, 0, cv::INTER_LINEAR);
  float dw = (size - new_w) / 2.0f, dh = (size - new_h) / 2.0f;
  int top = static_cast<int>(std::lround(dh - 0.1));
  int bottom = static_cast<int>(std::lround(dh + 0.1));
  int left = static_cast<int>(std::lround(dw - 0.1));
  int right = static_cast<int>(std::lround(dw + 0.1));
  cv::Mat out;
  cv::copyMakeBorder(resized, out, top, bottom, left, right,
                     cv::BORDER_CONSTANT, cv::Scalar(114, 114, 114));
  *ratio_out = r;
  return out;
}

std::string PlateString(const float* det) {
  std::string s = kPro[static_cast<int>(det[20]) % 31];
  s += kAlp[static_cast<int>(det[21]) % 24];
  for (int i = 2; i < 8; ++i) s += kAds[static_cast<int>(det[20 + i]) % 37];
  return s;
}

struct Args {
  std::string plugin, model, copts, image, out;
  int size = 640;
  int max_det = 300;
  int batch = 1;
  int bench = 0;  // >0: timed throughput loop over staged device batches
};

Args ParseArgs(int argc, char** argv) {
  Args a;
  for (int i = 1; i < argc - 1; ++i) {
    std::string k = argv[i];
    if (k == "--plugin") a.plugin = argv[++i];
    else if (k == "--model") a.model = argv[++i];
    else if (k == "--copts") a.copts = argv[++i];
    else if (k == "--image") a.image = argv[++i];
    else if (k == "--out") a.out = argv[++i];
    else if (k == "--size") a.size = std::atoi(argv[++i]);
    else if (k == "--max-det") a.max_det = std::atoi(argv[++i]);
    else if (k == "--batch") a.batch = std::atoi(argv[++i]);
    else if (k == "--bench") a.bench = std::atoi(argv[++i]);
  }
  if (a.plugin.empty() || a.model.empty() ||
      (a.image.empty() && a.bench == 0)) {
    std::fprintf(stderr,
                 "usage: yololp_runner --plugin <pjrt.so> --model <stablehlo> "
                 "--copts <file> --image <jpg> [--size 640] [--out out.jpg]\n"
                 "       yololp_runner ... --bench <iters> --batch <B>  "
                 "(throughput mode; artifact must be exported with batch B)\n");
    std::exit(2);
  }
  return a;
}

}  // namespace

int main(int argc, char** argv) {
  Args a = ParseArgs(argc, argv);

  void* handle = dlopen(a.plugin.c_str(), RTLD_NOW | RTLD_GLOBAL);
  if (!handle) {
    std::fprintf(stderr, "dlopen %s failed: %s\n", a.plugin.c_str(), dlerror());
    return 1;
  }
  auto get_api =
      reinterpret_cast<const PJRT_Api* (*)()>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "GetPjrtApi not found in %s\n", a.plugin.c_str());
    return 1;
  }
  g_api = get_api();
  std::printf("PJRT api version %d.%d\n", g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version);

  // ---- plugin init + client ----
  PJRT_Plugin_Initialize_Args iargs;
  std::memset(&iargs, 0, sizeof(iargs));
  iargs.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(g_api->PJRT_Plugin_Initialize(&iargs), "Plugin_Initialize");

  // Create options: harmless on standard plugins; required by remote-proxy
  // plugins (e.g. the axon TPU relay wants topology/session_id/rank).
  std::vector<PJRT_NamedValue> opts;
  std::string topology, session_id;
  auto add_str = [&](const char* name, const std::string& v) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = name;
    nv.name_size = std::strlen(name);
    nv.type = PJRT_NamedValue_kString;
    nv.string_value = v.c_str();
    nv.value_size = v.size();
    opts.push_back(nv);
  };
  auto add_int = [&](const char* name, int64_t v) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = name;
    nv.name_size = std::strlen(name);
    nv.type = PJRT_NamedValue_kInt64;
    nv.int64_value = v;
    nv.value_size = 1;
    opts.push_back(nv);
  };
  if (a.plugin.find("axon") != std::string::npos) {
    // env the python boot path (sitecustomize) exports before client create
    if (std::getenv("PALLAS_AXON_POOL_IPS") &&
        !std::getenv("AXON_POOL_SVC_OVERRIDE")) {
      setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);
      setenv("AXON_LOOPBACK_RELAY", "1", 0);
    }
    setenv("AXON_COMPAT_VERSION", "49", 0);
    setenv("TPU_SKIP_MDS_QUERY", "1", 0);
    setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
    const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
    topology = std::string(gen ? gen : "v5e") + ":1x1";
    char sid[64];
    std::snprintf(sid, sizeof(sid), "yololp-runner-%ld",
                  static_cast<long>(::getpid()) * 100003L + 7);
    session_id = sid;
    add_str("topology", topology);
    add_str("session_id", session_id);
    add_int("remote_compile",
            std::getenv("PALLAS_AXON_REMOTE_COMPILE") ? 1 : 0);
    add_int("local_only", 0);
    add_int("n_slices", 1);
    add_int("priority", 0);
    add_int("rank", static_cast<int64_t>(0xFFFFFFFFu));
  }

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = opts.empty() ? nullptr : opts.data();
  cargs.num_options = opts.size();
  Check(g_api->PJRT_Client_Create(&cargs), "Client_Create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_PlatformName_Args pargs;
  std::memset(&pargs, 0, sizeof(pargs));
  pargs.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pargs.client = client;
  Check(g_api->PJRT_Client_PlatformName(&pargs), "PlatformName");
  std::printf("platform: %.*s\n", static_cast<int>(pargs.platform_name_size),
              pargs.platform_name);

  PJRT_Client_AddressableDevices_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&dargs), "AddressableDevices");
  if (dargs.num_addressable_devices == 0) {
    std::fprintf(stderr, "no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = dargs.addressable_devices[0];

  // ---- compile ----
  std::string code = ReadFile(a.model);
  std::string copts = a.copts.empty() ? std::string() : ReadFile(a.copts);
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = code.data();
  program.code_size = code.size();
  program.format = "mlir";
  program.format_size = 4;

  PJRT_Client_Compile_Args kargs;
  std::memset(&kargs, 0, sizeof(kargs));
  kargs.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  kargs.client = client;
  kargs.program = &program;
  kargs.compile_options = copts.data();
  kargs.compile_options_size = copts.size();
  Check(g_api->PJRT_Client_Compile(&kargs), "Compile");
  PJRT_LoadedExecutable* executable = kargs.executable;
  std::printf("compiled %s (%zu KB)\n", a.model.c_str(), code.size() / 1024);

  auto destroy_buf = [&](PJRT_Buffer* buf) {
    PJRT_Buffer_Destroy_Args dgs;
    std::memset(&dgs, 0, sizeof(dgs));
    dgs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    dgs.buffer = buf;
    Check(g_api->PJRT_Buffer_Destroy(&dgs), "Buffer_Destroy");
  };

  // ---- throughput mode: staged device batches, per-iteration sync ----
  // (bench.py parity: inputs pre-staged in HBM so the tunnel's ~170 MB/s
  // host link is out of the measured path; device_complete event awaited
  // every iteration; median-free aggregate over the whole loop)
  if (a.bench > 0) {
    // Query the artifact's real output count: an end2end export has 3
    // outputs (dets, scores, num) and we sync on the last (tiny) one; a
    // raw export has 1. Hardcoding 3 dereferenced a null buffer on raw
    // artifacts.
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    std::memset(&ge, 0, sizeof(ge));
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = executable;
    Check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "GetExecutable");
    PJRT_Executable_NumOutputs_Args no;
    std::memset(&no, 0, sizeof(no));
    no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    no.executable = ge.executable;
    Check(g_api->PJRT_Executable_NumOutputs(&no), "NumOutputs");
    const size_t kNumOuts = no.num_outputs;
    if (kNumOuts < 2) {
      // Raw (non-end2end) artifacts have a single huge prediction output;
      // syncing on it would pull ~1 GB/iter over the host link and the
      // "bench" would measure tunnel bandwidth, not the model. Bench mode
      // therefore requires an end2end export whose last output is the tiny
      // (B,) num_valid tensor (ADVICE r3: reject rather than mis-measure).
      std::fprintf(stderr,
                   "--bench requires an end2end artifact (got %zu output); "
                   "re-export with --end2end\n", kNumOuts);
      return 4;
    }
    // Fresh-buffer rule (utils/profiler.py protocol, proven on the JAX
    // client): the axon relay can serve an identical (program, operands)
    // dispatch from a replay path, so every timed iteration should consume
    // a buffer the server has not seen. Stage one distinct buffer per
    // iteration of BOTH loops (sync + pipelined) plus warmup, capped by
    // HBM budget; above the cap buffers recycle and the JSON says so.
    const int kWanted = 2 * a.bench + 1;
    const int kStaged = std::min(kWanted, 48);
    const bool kFresh = kStaged == kWanted;
    size_t nbytes = static_cast<size_t>(a.batch) * a.size * a.size * 3;
    std::vector<PJRT_Buffer*> staged;
    std::vector<uint8_t> host(nbytes);
    unsigned seed = 12345;
    for (int s = 0; s < kStaged; ++s) {
      for (size_t i = 0; i < nbytes; ++i) {
        seed = seed * 1664525u + 1013904223u;
        host[i] = static_cast<uint8_t>(seed >> 24);
      }
      int64_t bdims[4] = {a.batch, a.size, a.size, 3};
      PJRT_Client_BufferFromHostBuffer_Args hb;
      std::memset(&hb, 0, sizeof(hb));
      hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
      hb.client = client;
      hb.data = host.data();
      hb.type = PJRT_Buffer_Type_U8;
      hb.dims = bdims;
      hb.num_dims = 4;
      hb.host_buffer_semantics =
          PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
      hb.device = device;
      Check(g_api->PJRT_Client_BufferFromHostBuffer(&hb), "BufferFromHost");
      AwaitEvent(hb.done_with_host_buffer, "h2d(stage)");
      staged.push_back(hb.buffer);
    }

    PJRT_ExecuteOptions bopts;
    std::memset(&bopts, 0, sizeof(bopts));
    bopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    // Per-iteration sync: the device_complete event over the axon relay
    // resolves on ENQUEUE, not completion (the round-1 "2.4 TFLOP conv in
    // 0.04ms" artifact) — so every iteration fetches the tiny `num` output
    // (4*B bytes) to host, which cannot finish before the program does.
    // In-flight execution slot: enqueue returns immediately with output
    // buffer futures; complete() awaits the device event then fetches the
    // tiny (B,) num output — the value fetch is the only event that
    // provably postdates the computation over the relay.
    struct Inflight {
      std::vector<PJRT_Buffer*> outs;
      PJRT_Event* ev = nullptr;
    };
    auto enqueue = [&](PJRT_Buffer* in) {
      Inflight f;
      f.outs.assign(kNumOuts, nullptr);
      PJRT_Buffer* args1[1] = {in};
      PJRT_Buffer* const* argl[1] = {args1};
      PJRT_Buffer** outl[1] = {f.outs.data()};
      PJRT_LoadedExecutable_Execute_Args ex;
      std::memset(&ex, 0, sizeof(ex));
      ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
      ex.executable = executable;
      ex.options = &bopts;
      ex.argument_lists = argl;
      ex.num_devices = 1;
      ex.num_args = 1;
      ex.output_lists = outl;
      ex.device_complete_events = &f.ev;
      Check(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute(bench)");
      return f;
    };
    auto complete = [&](Inflight& f) {
      AwaitEvent(f.ev, "execute(bench)");
      PJRT_Buffer_ToHostBuffer_Args th;
      std::memset(&th, 0, sizeof(th));
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = f.outs[kNumOuts - 1];
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHost(num,size)");
      std::vector<uint8_t> num_host(th.dst_size);
      th.dst = num_host.data();
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHost(num,copy)");
      AwaitEvent(th.event, "d2h(num)");
      for (PJRT_Buffer* b : f.outs) destroy_buf(b);
    };
    int next = 0;  // round-robin cursor over the staged pool
    auto take = [&]() { return staged[next++ % kStaged]; };

    {
      Inflight w = enqueue(take());  // warmup (compile done; warms caches)
      complete(w);
    }

    // sync mode: one dispatch at a time, per-iteration completion — the
    // latency-faithful number (every iteration pays the relay round trip).
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < a.bench; ++i) {
      Inflight f = enqueue(take());
      complete(f);
    }
    auto t1 = std::chrono::steady_clock::now();
    double sync_s = std::chrono::duration<double>(t1 - t0).count();

    // pipelined mode (depth 2): enqueue i+1 before completing i, so the
    // completion fetch's round trip overlaps the next execution — the
    // deployment-throughput number (TRT-demo CUDA-stream analogue).
    t0 = std::chrono::steady_clock::now();
    Inflight prev = enqueue(take());
    for (int i = 1; i < a.bench; ++i) {
      Inflight cur = enqueue(take());
      complete(prev);
      prev = cur;
    }
    complete(prev);
    t1 = std::chrono::steady_clock::now();
    double pipe_s = std::chrono::duration<double>(t1 - t0).count();

    std::printf(
        "{\"native_bench\": {\"batch\": %d, \"size\": %d, \"iters\": %d, "
        "\"fresh_buffers\": %s, "
        "\"sync\": {\"total_s\": %.3f, \"ms_per_batch\": %.2f, "
        "\"images_per_sec\": %.1f}, "
        "\"pipelined\": {\"total_s\": %.3f, \"ms_per_batch\": %.2f, "
        "\"images_per_sec\": %.1f}, "
        "\"ms_per_batch\": %.2f, \"images_per_sec\": %.1f}}\n",
        a.batch, a.size, a.bench, kFresh ? "true" : "false",
        sync_s, 1e3 * sync_s / a.bench,
        static_cast<double>(a.batch) * a.bench / sync_s,
        pipe_s, 1e3 * pipe_s / a.bench,
        static_cast<double>(a.batch) * a.bench / pipe_s,
        1e3 * pipe_s / a.bench,
        static_cast<double>(a.batch) * a.bench / pipe_s);
    for (PJRT_Buffer* b : staged) destroy_buf(b);
    return 0;
  }

  // ---- preprocess ----
  cv::Mat bgr = cv::imread(a.image);
  if (bgr.empty()) {
    std::fprintf(stderr, "cannot read image %s\n", a.image.c_str());
    return 1;
  }
  float ratio;
  cv::Mat boxed = Letterbox(bgr, a.size, &ratio);
  cv::Mat rgb;
  cv::cvtColor(boxed, rgb, cv::COLOR_BGR2RGB);

  // ---- upload ----
  int64_t dims[4] = {1, a.size, a.size, 3};
  PJRT_Client_BufferFromHostBuffer_Args bargs;
  std::memset(&bargs, 0, sizeof(bargs));
  bargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  bargs.client = client;
  bargs.data = rgb.data;
  bargs.type = PJRT_Buffer_Type_U8;
  bargs.dims = dims;
  bargs.num_dims = 4;
  bargs.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  bargs.device = device;
  Check(g_api->PJRT_Client_BufferFromHostBuffer(&bargs), "BufferFromHost");
  AwaitEvent(bargs.done_with_host_buffer, "h2d");
  PJRT_Buffer* input = bargs.buffer;

  // ---- execute (outputs: det f32 (1,max_det,28), valid pred, num s32) ----
  PJRT_ExecuteOptions options;
  std::memset(&options, 0, sizeof(options));
  options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* arg_list[1] = {input};
  PJRT_Buffer* const* arg_lists[1] = {arg_list};
  std::vector<PJRT_Buffer*> out_list(3, nullptr);
  PJRT_Buffer** out_lists[1] = {out_list.data()};
  PJRT_Event* done = nullptr;

  PJRT_LoadedExecutable_Execute_Args eargs;
  std::memset(&eargs, 0, sizeof(eargs));
  eargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  eargs.executable = executable;
  eargs.options = &options;
  eargs.argument_lists = arg_lists;
  eargs.num_devices = 1;
  eargs.num_args = 1;
  eargs.output_lists = out_lists;
  eargs.device_complete_events = &done;
  Check(g_api->PJRT_LoadedExecutable_Execute(&eargs), "Execute");
  AwaitEvent(done, "execute");

  auto fetch = [&](PJRT_Buffer* buf) {
    PJRT_Buffer_ToHostBuffer_Args targs;
    std::memset(&targs, 0, sizeof(targs));
    targs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    targs.src = buf;
    Check(g_api->PJRT_Buffer_ToHostBuffer(&targs), "ToHost(size)");
    std::vector<uint8_t> host(targs.dst_size);
    targs.dst = host.data();
    Check(g_api->PJRT_Buffer_ToHostBuffer(&targs), "ToHost(copy)");
    AwaitEvent(targs.event, "d2h");
    return host;
  };

  std::vector<uint8_t> det_raw = fetch(out_list[0]);
  std::vector<uint8_t> num_raw = fetch(out_list[2]);
  const float* det = reinterpret_cast<const float*>(det_raw.data());
  int num = reinterpret_cast<const int32_t*>(num_raw.data())[0];

  // ---- report + draw (rescale letterbox -> source coords) ----
  float pad_w = (a.size - bgr.cols * ratio) / 2.0f;
  float pad_h = (a.size - bgr.rows * ratio) / 2.0f;
  std::printf("%d plate(s) detected in %s\n", num, a.image.c_str());
  for (int i = 0; i < num && i < a.max_det; ++i) {
    const float* d = det + i * 28;
    float conf = 0;
    for (int c = 12; c < 20; ++c) conf += d[c];
    conf /= 8.0f;
    float coords[12];
    for (int c = 0; c < 12; ++c) {
      float pad = (c % 2 == 0) ? pad_w : pad_h;
      float lim = (c % 2 == 0) ? bgr.cols : bgr.rows;
      coords[c] = std::min(std::max((d[c] - pad) / ratio, 0.0f), lim);
    }
    std::printf("  %s conf=%.3f box=[%.0f, %.0f, %.0f, %.0f]\n",
                PlateString(d).c_str(), conf, coords[0], coords[1], coords[2],
                coords[3]);
    if (!a.out.empty()) {
      cv::rectangle(bgr, cv::Point(coords[0], coords[1]),
                    cv::Point(coords[2], coords[3]), cv::Scalar(255, 255, 255),
                    2);
      for (int k = 0; k < 4; ++k) {
        cv::line(bgr, cv::Point(coords[4 + 2 * k], coords[5 + 2 * k]),
                 cv::Point(coords[4 + 2 * ((k + 1) % 4)],
                           coords[5 + 2 * ((k + 1) % 4)]),
                 cv::Scalar(0, 255, 255), 2);
      }
    }
  }
  if (!a.out.empty()) {
    cv::imwrite(a.out, bgr);
    std::printf("annotated image written to %s\n", a.out.c_str());
  }
  return 0;
}
